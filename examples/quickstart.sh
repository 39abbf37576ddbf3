#!/usr/bin/env bash
# End-to-end quickstart on a synthetic 30-second corpus: preprocess ->
# train the acoustic model -> train a HiFiGAN vocoder -> synthesize wav ->
# serve over HTTP. Everything runs on whatever JAX backend is available
# (TPU if reachable, else CPU — CPU compiles are slow but complete).
#
#   bash examples/quickstart.sh /tmp/fs2t_quickstart
#
# Step counts are demo-sized; for real training raise --max-steps and use
# a real corpus filelist (see docs/CONFIG.md and README).
set -euo pipefail

WS="${1:-/tmp/fs2t_quickstart}"
STEPS="${STEPS:-60}"
PY="${PYTHON:-python}"

mkdir -p "$WS"
echo "== 1/6 synthetic corpus + config -> $WS"
"$PY" - "$WS" <<'EOF'
import sys
from pathlib import Path

import numpy as np
import yaml

from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
from fastspeech2_lightning_tpu.utils import write_filelist

ws = Path(sys.argv[1])
sr = 22050
rng = np.random.default_rng(0)
rows = []
texts = ["a bright morning", "the river bends east", "cold wind tonight",
         "seven silver boats", "learning never stops", "echoes in the hall"]
for i, text in enumerate(texts):
    t = np.arange(int((1.0 + 0.3 * i) * sr)) / sr
    f0 = 120 + 15 * i
    wav = 0.35 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    save_wav(ws / "wavs" / f"utt{i}.wav", wav.astype(np.float32), sr)
    rows.append({"basename": f"utt{i}", "text": text,
                 "speaker": "default", "language": "default"})
write_filelist(rows, ws / "filelist.psv")
config = {
    "model": {
        "encoder": {"layers": 2, "heads": 2, "input_dim": 64,
                    "feedforward_dim": 128, "conv_kernel_size": 3},
        "decoder": {"layers": 2, "heads": 2, "input_dim": 64,
                    "feedforward_dim": 128, "conv_kernel_size": 3},
        "variance_predictors": {
            "energy": {"input_dim": 64, "n_layers": 2, "n_bins": 32},
            "pitch": {"input_dim": 64, "n_layers": 2, "n_bins": 32},
            "duration": {"input_dim": 64, "n_layers": 2, "n_bins": 32},
        },
        "max_mel_length": 256,
        "learn_alignment": True,
    },
    "preprocessing": {
        "save_dir": str(ws / "preprocessed"),
        "source_data": [{"data_dir": str(ws / "wavs"),
                         "filelist": str(ws / "filelist.psv")}],
        "audio": {"n_mels": 80},
    },
    "training": {
        "batch_size": 3,
        "training_filelist": str(ws / "preprocessed" / "training_filelist.psv"),
        "validation_filelist": str(ws / "preprocessed" / "validation_filelist.psv"),
        "logger": {"save_dir": str(ws / "logs")},
    },
    "text": {"symbols": {"letters": list("abcdefghijklmnopqrstuvwxyz")}},
}
(ws / "config.yaml").write_text(yaml.safe_dump(config))
print("wrote", ws / "config.yaml")
EOF

FS2T="$PY -m fastspeech2_lightning_tpu"
echo "== 2/6 preprocess"
$FS2T preprocess "$WS/config.yaml"

echo "== 3/6 train acoustic model ($STEPS steps)"
$FS2T train "$WS/config.yaml" --max-steps "$STEPS" --no-resume

CKPT=$(ls -d "$WS"/logs/*/*/checkpoints/step=* | sort -t= -k2 -n | tail -1)
echo "   checkpoint: $CKPT"

echo "== 4/6 train vocoder ($STEPS steps, demo-sized)"
$FS2T train-vocoder "$WS/config.yaml" --max-steps "$STEPS" \
    --batch-size 2 --ckpt-steps "$STEPS"
VOC="$WS/logs/vocoder/checkpoints/vocoder.npz"
echo "   vocoder: $VOC"

echo "== 5/6 synthesize"
$FS2T synthesize "$CKPT" -t "hello quickstart" \
    -O wav -O textgrid -v "$VOC" -o "$WS/out"
find "$WS/out" -type f | sed 's/^/   /'

echo "== 6/6 serve (health smoke)"
$FS2T serve "$CKPT" -v "$VOC" --port 8799 &
SRV=$!
trap 'kill $SRV 2>/dev/null || true' EXIT
HEALTH=""
for _ in $(seq 1 12); do
    sleep 5
    HEALTH=$(curl -s --max-time 10 http://127.0.0.1:8799/health || true)
    [ -n "$HEALTH" ] && break
done
echo "health: $HEALTH"
case "$HEALTH" in *'"status": "ok"'*) ;; *) echo "server smoke FAILED"; exit 1;; esac
kill $SRV; trap - EXIT
echo "quickstart complete: outputs under $WS"
