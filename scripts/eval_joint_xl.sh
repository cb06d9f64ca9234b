#!/bin/bash
# Evaluate the XL joint denoise+vocoder run at several checkpoints.
# Usage: scripts/eval_joint_xl.sh <step> [<step> ...]
# For each step: vocoder-mode decode of the test split + full metric
# battery (quality_eval --skip_decode), appended to QUALITY_r3.json.
# Checkpoint snapshots live in Experiments/synth_xl/keep/g_<8digit>.
set -eu
CFG=nvse_tpu/configs/bsrnn_joint_denoise_vocoder_xl_config.json
for STEP in "$@"; do
    TAG=$(printf "%08d" "$STEP")
    CK="Experiments/synth_xl/keep/g_${TAG}"
    [ -d "$CK" ] || CK="Experiments/synth_xl/BSRNN_joint/g_${TAG}"
    [ -d "$CK" ] || { echo "missing checkpoint $CK" >&2; exit 1; }
    TMPCFG=$(mktemp /tmp/joint_xl_eval_XXXX.json)
    python - "$CFG" "$CK" "$TMPCFG" <<'EOF'
import json, sys
h = json.load(open(sys.argv[1]))
h["checkpoint_file_load"] = sys.argv[2]
h["test_output_dir"] = "File_Decodes/synth_xl/eval_" + sys.argv[2].rsplit("_", 1)[-1]
json.dump(h, open(sys.argv[3], "w"), indent=1)
EOF
    echo "== step $STEP: vocoder decode =="
    python infers/inference_joint_denoise_vocoder_bsrnn.py \
        --cfg_filename "$TMPCFG" --processing_mode vocoder
    echo "== step $STEP: scoring =="
    python scripts/quality_eval.py --cfg_filename "$TMPCFG" --skip_decode \
        --label "joint_xl_${STEP}_vocoder" --out QUALITY_r3.json
    rm -f "$TMPCFG"
done
