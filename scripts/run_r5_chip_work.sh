#!/bin/bash
# Round-5 chip work, in priority order (VERDICT r4 next-round items
# 2/3/5/7). Each step is independently resumable; re-running the script
# skips nothing by itself, but measure_parity resumes per workdir and
# the persistent compile cache makes re-runs cheap.
#
# Run only when the TPU tunnel is up:
#   timeout 90 python -c "import jax; print(jax.devices())"
set -ex -o pipefail
cd /root/repo

# 1. the round's headline numbers (also exercises the new per-section
#    error recording and the pinned Griffin-Lim row)
timeout 3600 python bench.py | tee /tmp/r5_bench.json

# 2. SynthesisModelCNN roofline proof: batch 32/64/128 MFU sweep +
#    optimizer-only floor + fused-vs-optax NAdam (PROFILE.md update)
timeout 3600 python scripts/roofline_synthesis.py | tee /tmp/r5_roofline.json

# 3. CNN-RNN parity cells widened to 48 seeds (easy + hard subject);
#    fresh workdirs (the r4 ones are gone), pipeline re-runs once per
#    workdir. Torch columns stay at the r4-recorded 3-seed values.
timeout 3600 python scripts/measure_parity.py \
  --only pipeline,cnnrnn --seeds 48 --seed-chunk 24 --skip-torch-cnn \
  --workdir /tmp/parity_r5_easy
timeout 5400 python scripts/measure_parity.py \
  --only pipeline,cnnrnn --seeds 48 --seed-chunk 24 --skip-torch-cnn \
  --noise-scale 4.5 --workdir /tmp/parity_r5_hard
