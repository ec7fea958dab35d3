#!/bin/bash
# Real-weight validation runbook: one command from network access to the
# verdict-grade parity report (README "Real-weight validation").
#
# This environment has no egress, so the suno checkpoints have never been
# run here; any operator WITH network produces the report with:
#
#     tools/realweights_runbook.sh [WEIGHTS_DIR]
#
# Steps (mirrors the reference CI, /root/reference/.github/workflows/
# run.yml:58-100: download -> convert -> run -> quantize -> run):
#   1. download bark-small from HF (suno/bark) into WEIGHTS_DIR/hf
#   2. convert to ggml_weights.bin (cli.convert — same format/tensor names
#      as the reference's convert.py, weight-norm folded)
#   3. sha256 the checkpoint; compare against tools/realweights_hashes.json
#      when an entry exists, record it into the report either way
#   4. run the realweights pytest harness: temp-0 golden tokens
#      (recorded on first run, bit-asserted after), full-pipeline audio,
#      spectral MSE vs reference.wav when present, quantized-serving parity
#      (TPU only)
#   5. write WEIGHTS_DIR/report.json
#
# Spectral parity needs WEIGHTS_DIR/reference.wav: a waveform from the ggml
# reference binary with the same weights + prompt, e.g.
#     ./build/examples/main/main -m ggml_weights.bin -p "hello" -t 4 -s 0
#     -o reference.wav
#
# `--dry-run` validates the whole machinery here and now, without network:
# the checkpoint is the tiny random fixture and the harness runs in its
# token space (BARK_REALWEIGHTS_TINY).
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DRY=0
if [ "${1:-}" = "--dry-run" ]; then
  DRY=1
  WEIGHTS_DIR=${2:-$(mktemp -d /tmp/realweights_dry.XXXX)}
else
  WEIGHTS_DIR=${1:-"$HOME/.cache/bark_tpu/realweights"}
fi
mkdir -p "$WEIGHTS_DIR"
echo "== weights dir: $WEIGHTS_DIR (dry-run=$DRY)"

if [ "$DRY" = 1 ]; then
  export BARK_REALWEIGHTS_TINY=1
  python - "$WEIGHTS_DIR" "$REPO" <<'EOF'
import os, sys
sys.path.insert(0, sys.argv[2])
from tests.tiny_model import build_tiny_model
from bark_tpu.io import ggml
path = os.path.join(sys.argv[1], "ggml_weights.bin")
ggml.write_model_file(path, build_tiny_model())
print("wrote tiny checkpoint:", path)
EOF
elif [ ! -f "$WEIGHTS_DIR/ggml_weights.bin" ]; then
  echo "== step 1: download bark-small (needs network)"
  python -m bark_tpu.cli.download --out-dir "$WEIGHTS_DIR/hf" \
    --models bark-small
  echo "== step 2: convert to ggml_weights.bin"
  python -m bark_tpu.cli.convert --dir-model "$WEIGHTS_DIR/hf/bark-small" \
    --out-dir "$WEIGHTS_DIR" --use-f16
else
  echo "== checkpoint already present, skipping download/convert"
fi

echo "== step 3: checkpoint hash"
SHA=$(sha256sum "$WEIGHTS_DIR/ggml_weights.bin" | cut -d' ' -f1)
echo "sha256: $SHA"

echo "== step 4: realweights harness"
PYTEST_ARGS=(-m realweights -q -rs -s)
if [ "$DRY" = 1 ]; then
  # the quantized-serving test assumes real bark shapes (Pallas-eligible);
  # dry-run validates the golden/audio/spectral machinery
  PYTEST_ARGS+=(-k "golden or full_pipeline or spectral")
fi
RC=0
BARK_WEIGHTS_DIR="$WEIGHTS_DIR" \
  python -m pytest "${PYTEST_ARGS[@]}" "$REPO/tests/test_realweights.py" \
  | tee "$WEIGHTS_DIR/pytest.log" || RC=$?

echo "== step 5: report"
python - "$WEIGHTS_DIR" "$SHA" "$RC" "$DRY" "$REPO" <<'EOF'
import hashlib, json, os, sys, time
wd, sha, rc, dry, repo = sys.argv[1:6]
rc = int(rc)
known = {}
kpath = os.path.join(repo, "tools", "realweights_hashes.json")
if os.path.exists(kpath):
    known = json.load(open(kpath))
goldens = {}
gdir = os.path.join(wd, "golden")
if os.path.isdir(gdir):
    for f in sorted(os.listdir(gdir)):
        h = hashlib.sha256(open(os.path.join(gdir, f), "rb").read())
        goldens[f] = h.hexdigest()[:16]
report = {
    "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "dry_run": dry == "1",
    "checkpoint_sha256": sha,
    "checkpoint_known": known.get("ggml_weights.bin") == sha
        if "ggml_weights.bin" in known else None,
    "golden_token_hashes": goldens,
    "pytest_rc": rc,
    "spectral": None,
}
log = os.path.join(wd, "pytest.log")
if os.path.exists(log):
    for line in open(log):
        if '"log_mel_mse"' in line and "{" in line:
            try:  # pytest progress dots may prefix the line
                report["spectral"] = json.loads(line[line.index("{"):])
            except ValueError:
                pass
out = os.path.join(wd, "report.json")
json.dump(report, open(out, "w"), indent=2)
print(json.dumps(report, indent=2))
print("report:", out)
EOF
exit $RC
