from .torch_to_jax import (
    convert_clip_text,
    convert_diffusion,
    convert_melgan_generator,
    convert_vqgan,
    load_torch_state_dict,
)
