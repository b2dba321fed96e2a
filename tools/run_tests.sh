#!/bin/sh
# Chunked test runner for 1-core hosts.
#
# The full suite takes ~12-20 min on one vCPU; a single pytest invocation can
# blow through a 10-minute CI timeout (see CLAUDE.md). Each chunk below stays
# well under that limit and the chunks together cover every file in tests/.
# A coverage guard at the end fails if a new test file is not in any chunk.
#
# Usage: sh tools/run_tests.sh [chunk]   (chunk = 1..9; default: all)
set -u
cd "$(dirname "$0")/.."

CHUNK1="tests/test_signal.py tests/test_diffusion_math.py tests/test_sampling_ops.py \
tests/test_fused_sampler.py tests/test_quant.py tests/test_int8_blocks.py \
tests/test_vqgan.py tests/test_gpt.py \
tests/test_clip.py tests/test_melgan.py tests/test_data.py tests/test_config.py \
tests/test_trace_util.py"
CHUNK2="tests/test_diffusion_model.py tests/test_composite.py tests/test_engine.py \
tests/test_solver.py tests/test_evaluation.py tests/test_captioner.py \
tests/test_caption_metrics_full.py"
CHUNK3="tests/test_convert.py tests/test_reference_parity.py tests/test_melception_full.py"
CHUNK6="tests/test_learning.py tests/test_checkpoint_gate.py tests/test_longform.py"
CHUNK7="tests/test_serve_cli.py tests/test_classifier_solver.py tests/test_native_loader.py \
tests/test_int8_runtime.py tests/test_artifacts.py"
CHUNK4="tests/test_cli.py tests/test_int8_drift_gate.py tests/test_multiprocess.py \
tests/test_gan_step_parity.py"
CHUNK5="tests/test_vocoder_training.py tests/test_vocoder_learning.py \
tests/test_vqgan_training.py tests/test_static_quant.py tests/test_fused_gn_conv.py \
tests/test_parallel.py"
CHUNK8="tests/test_e2e_chain.py"
CHUNK9="tests/test_parallel_generation.py"

fail=0
run_chunk() {
    echo "=== chunk $1 ==="
    # shellcheck disable=SC2086
    python -m pytest $2 -q || fail=1
}

check_coverage() {
    all="$CHUNK1 $CHUNK2 $CHUNK3 $CHUNK4 $CHUNK5 $CHUNK6 $CHUNK7 $CHUNK8 $CHUNK9"
    for f in tests/test_*.py; do
        case " $all " in
            *" $f "*) ;;
            *) echo "ERROR: $f is not in any chunk of tools/run_tests.sh"; fail=1 ;;
        esac
    done
}

case "${1:-all}" in
    1) run_chunk 1 "$CHUNK1" ;;
    2) run_chunk 2 "$CHUNK2" ;;
    3) run_chunk 3 "$CHUNK3" ;;
    4) run_chunk 4 "$CHUNK4" ;;
    5) run_chunk 5 "$CHUNK5" ;;
    6) run_chunk 6 "$CHUNK6" ;;
    7) run_chunk 7 "$CHUNK7" ;;
    8) run_chunk 8 "$CHUNK8" ;;
    9) run_chunk 9 "$CHUNK9" ;;
    all)
        check_coverage
        run_chunk 1 "$CHUNK1"
        run_chunk 2 "$CHUNK2"
        run_chunk 3 "$CHUNK3"
        run_chunk 4 "$CHUNK4"
        run_chunk 5 "$CHUNK5"
        run_chunk 6 "$CHUNK6"
        run_chunk 7 "$CHUNK7"
        run_chunk 8 "$CHUNK8"
        run_chunk 9 "$CHUNK9"
        ;;
    *) echo "usage: sh tools/run_tests.sh [1|2|3|4|5|6|7|8|9|all]"; exit 2 ;;
esac
exit $fail
