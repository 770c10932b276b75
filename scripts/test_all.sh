#!/usr/bin/env bash
# One-command test story (VERDICT.md round-4 weak #7): the full suite in
# timeout-safe chunks that a single-core box can finish, one invocation,
# exit 0 == everything passed.
#
#   scripts/test_all.sh            # full suite, chunked
#   scripts/test_all.sh --fast     # skip @slow end-to-end tests
#
# Why chunks: one `pytest tests/` run holds every compiled XLA program and
# every RAM-cached fixture of 30+ files in a single process — on a small
# box that both exhausts memory and blows any sane timeout.  Chunking by
# subsystem keeps each invocation minutes-sized and failure output local.
set -u
cd "$(dirname "$0")/.."

FAST=""
if [[ "${1:-}" == "--fast" ]]; then
  FAST='-m not slow'
fi

CHUNKS=(
  # core model parity
  "tests/test_lpsr.py tests/test_yolo.py"
  # ops + pallas kernels
  "tests/test_pallas_kernel.py tests/test_pallas_front.py tests/test_pallas_mid.py tests/test_resample.py"
  # data + degradation + metrics
  "tests/test_degradation.py tests/test_gan_degradation.py tests/test_data_metrics.py"
  # pipeline + serving + native
  "tests/test_pipeline.py tests/test_serve.py tests/test_native.py"
  # training
  "tests/test_train_lpsr.py tests/test_yolo_train.py tests/test_rect_val.py"
  # eval + accuracy regressions
  "tests/test_eval.py tests/test_eval_regression.py tests/test_char_ocr_selftrained.py"
  # export / import
  "tests/test_onnx_export.py tests/test_onnx_import.py tests/test_export_torch.py tests/test_export_stablehlo.py"
  # infra: registry, utils, evolve, multiproc, CLIs, entry, docs
  "tests/test_registry.py tests/test_utils.py tests/test_utils2.py tests/test_evolve_artifacts.py"
  "tests/test_multiproc.py tests/test_graft_entry.py tests/test_cli.py tests/test_readme.py"
)

# any test file not listed above runs in a final catch-all chunk, so new
# files can't silently drop out of "all tests"
listed=$(printf '%s\n' "${CHUNKS[@]}" | tr ' ' '\n' | sort)
all=$(ls tests/test_*.py | sort)
extra=$(comm -23 <(echo "$all") <(echo "$listed") | tr '\n' ' ')
if [[ -n "${extra// /}" ]]; then
  CHUNKS+=("$extra")
fi

fail=0
i=0
for chunk in "${CHUNKS[@]}"; do
  i=$((i + 1))
  echo "=== chunk $i/${#CHUNKS[@]}: $chunk"
  if [[ -n "$FAST" ]]; then
    python -m pytest $chunk -q -m "not slow" || fail=1
  else
    python -m pytest $chunk -q || fail=1
  fi
done

if [[ $fail -ne 0 ]]; then
  echo "FAILED: at least one chunk failed (see above)"
  exit 1
fi
echo "OK: all ${#CHUNKS[@]} chunks passed"
