#!/usr/bin/env bash
# Serve a released checkpoint over the local mesh (v5e-8: --mesh 1,8,1).
set -euo pipefail
CKPT=${1:?usage: serve.sh /path/to/BAGEL-7B-MoT [mesh]}
MESH=${2:-1,8,1}
python -m bagel_tpu.serving.app --checkpoint "$CKPT" --mesh "$MESH"
