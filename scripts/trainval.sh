#!/usr/bin/env bash
# Canonical train + eval invocations (reference: trainval.sh:7-27), using the
# cmpc-refseg CLI.  Adjust dataset paths for your environment.
set -e

# RefVOS training, batch size 8, bf16, data-parallel over all local devices
python -m cmpc_refseg_tpu.cli -m train -d refvos -t train -n CMPC_model \
    -i 700000 -s 100000 -bs 8 -dtype bfloat16 -mesh 0 \
    -im_dir data/train/JPEGImages -mask_dir data/train/Annotations \
    -meta data/train_metadata.json -vocab data/vocabulary_refvos.txt \
    -emb refvos -emb_dir data -ckpt_dir ./checkpoints -log_dir ./logs

# UNC val evaluation with DenseCRF refinement
python -m cmpc_refseg_tpu.cli -m test -d unc -t val -n CMPC_model \
    -f ./data -ckpt_dir ./checkpoints -c
