from .model import ACTCaptioner, AudioPatchEncoder, greedy_decode, beam_decode
