#!/bin/bash
# Round-5 chain for VERDICT r4 item 1: regenerate the positive-control
# artifacts (the round-3 originals were wiped with the VM) and RUN the
# four-probe divergence diagnostic.  All stages CPU (PVR_TPU_PLATFORM=cpu)
# so the TPU tunnel stays free for the encoder study.
#
# Stage 1: datagen(1000 traj, coherent lookahead expert) + random embed
#          + jax BC s1, 600 epochs @ lr 1e-3 batch_norm  (validate_learning)
# Stage 2: reference-faithful torch control, same data/budget, saves
#          torch_final.pt + 200-episode final eval
# Stage 3: scripts/diag_control_divergence.py (4 probes, 200 episodes)
set -x
export PVR_TPU_PLATFORM=cpu
W=/root/study_pc
mkdir -p $W
cd /root/repo

python scripts/validate_learning.py --workdir $W \
    --env FakePointNav-room_0 --n_trajectories 1000 \
    --epochs 600 --eval_frequency 150 \
    > $W/jax_control.log 2>&1 || { echo STAGE1_FAIL; exit 1; }
echo STAGE1_OK

python scripts/positive_control_torch.py --workdir $W \
    --env FakePointNav-room_0 --epochs 600 --eval_frequency 150 \
    --save_model $W/torch_final.pt --final_episodes 200 \
    --out $W/torch_history.pkl \
    > $W/torch_control.log 2>&1 || { echo STAGE2_FAIL; exit 1; }
echo STAGE2_OK

python scripts/diag_control_divergence.py --workdir $W --episodes 200 \
    > $W/diag.log 2>&1 || { echo STAGE3_FAIL; exit 1; }
echo STAGE3_OK
echo DIAG_CHAIN_DONE
