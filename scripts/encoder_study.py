"""Encoder-comparison study — the reference's raison d'être, run
end-to-end on the hermetic FakeNav simulator through the real pipeline
(reference slurm_bc.py:54-129 grid semantics: fixed budget,
essential-save evals, per-seed runs, completed-run skip).

Grid: {scene} x {encoder family} x {run_id 1..N} BC runs on a shared
10k-trajectory expert dataset, each encoder's embedded pickle computed
once by the bulk embedder (idempotent).  'random' routes through the
embed-at-load trainer per seed (seed-dependent encoder), exactly like
the reference sweep (slurm_bc.py:208-211).

HONEST SCOPE NOTE: this environment has no network egress, so
torchvision/MoCo/CLIP/MAE pretrained checkpoints are unavailable; the
study compares encoder ARCHITECTURES at random init (plus the
true_state oracle baseline).  That demonstrates the framework's
end-to-end separation machinery — the class of result the reference
produces — not the paper's pretrained-representation rankings.
Untrained-CNN features are a recognized baseline in the PVR literature,
so architecture separation (deep resnet50 vs 5-layer random conv vs
true_state) is still a meaningful axis.

Every stage is idempotent and subprocess-isolated with timeouts, so a
wedged TPU tunnel loses one stage, not the study; rerunning resumes.

Usage:
  python scripts/encoder_study.py --workdir /root/study [--collate]
"""

import argparse
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENCODERS = ["resnet50", "resnet50_l3", "mae_base", "random", "true_state"]

# Budget: batch 32 x unroll 100 x 3000 epochs = 9.6M frames, lr 1e-3 —
# the regime where round-2 single-encoder runs showed success rising
# through ~50% of the budget (docs/DESIGN.md "End-to-end learning
# validation"); essential-save gates evals to the ~1/10/50/97% marks.
BATCH, UNROLL, EPOCHS = 32, 100, 3000
MAX_FRAMES = BATCH * UNROLL * EPOCHS
EVAL_FREQUENCY = 75
N_EPISODES = 30
MAX_EP_STEPS = 100


def sh(cmd, timeout, log):
    print("+", " ".join(cmd), flush=True)
    with open(log, "ab") as handle:
        try:
            proc = subprocess.run(cmd, cwd=REPO, stdout=handle,
                                  stderr=subprocess.STDOUT,
                                  timeout=timeout)
            return proc.returncode
        except subprocess.TimeoutExpired:
            return -1


def stage_datagen(workdir, scene, n_traj, log):
    from pvr_habitat_tpu.data import formats

    if os.path.isfile(formats.raw_path(workdir, scene)):
        return True
    rc = sh([sys.executable, "behavioral_cloning/save_opt_trajectories.py",
             "--env", scene, "--n_trajectories", str(n_traj),
             "--save_path", workdir, "--max_episode_steps",
             str(MAX_EP_STEPS)], timeout=7200, log=log)
    return rc == 0


def stage_embed(workdir, scene, encoder, log):
    from pvr_habitat_tpu.data import formats

    if os.path.isfile(formats.embedded_path(workdir, scene, encoder)):
        return True
    # Sharded pipeline (works on a (1,1) mesh too): pipelined
    # upload/compute/download transport + bf16 serving — ~2x fewer
    # tunnel bytes than the plain f32 path for the 600k-frame dataset.
    rc = sh([sys.executable, "behavioral_cloning/save_embedded_obs.py",
             "--env", scene, "--embedding_name", encoder,
             "--disable_pretrained_embedding",
             "--sharded_embed", "--compute_dtype", "bfloat16",
             "--source", "pickle", "--data_path", workdir,
             "--batch_size", "256"], timeout=3600, log=log)
    return rc == 0


def bc_cmd(workdir, scene, encoder, run_id):
    main = "main_bc_1.py" if encoder == "random" else "main_bc_2.py"
    return [sys.executable, main,
            "--env", scene, "--to_env", scene,
            "--embedding_name", encoder,
            "--disable_pretrained_embedding",
            "--data_path", workdir,
            "--save_path", os.path.join(workdir, "bc"),
            "--run_id", str(run_id),
            "--batch_size", str(BATCH), "--unroll_length", str(UNROLL),
            "--embed_batch_size", "256",
            # The 2-5 GB embedded datasets MUST be HBM-resident: the
            # host-side gather fallback uploads ~26 MB/epoch * 3000
            # epochs through the tunnel (~1h/run at ~23 MB/s).
            "--data_on_device", "always",
            "--learning_rate", "0.001",
            "--max_frames", str(MAX_FRAMES),
            "--eval_frequency", str(EVAL_FREQUENCY),
            "--essential_save_only",
            "--n_episodes_test", str(N_EPISODES),
            "--max_episode_steps", str(MAX_EP_STEPS),
            "--eval_batch", "5"] + \
        (["--batch_norm"] if encoder != "true_state" else [])


def stats_path(workdir, scene, encoder, run_id):
    return os.path.join(workdir, "bc",
                        f"{scene}_em{encoder}_s{run_id}_{scene}.pickle")


def run_completed(workdir, scene, encoder, run_id):
    path = stats_path(workdir, scene, encoder, run_id)
    if not os.path.isfile(path):
        return False
    with open(path, "rb") as handle:
        stats = pickle.load(handle)[scene]
    return stats["frames"][-1] >= MAX_FRAMES - BATCH * UNROLL


FINAL_WINDOW = 7  # real evals inside the 97%-mark essential window


def collate(workdir, scene, run_ids, encoders=None):
    """Per-encoder summary over seeds.

    Headline statistic: mean success over the FINAL_WINDOW last real
    eval points of each seed (30 episodes each; a single point has
    binomial se ~±0.055 at p=0.1, the window mean ~±0.02), plus the
    final teacher-forced NLL — the low-noise secondary axis.  The
    reference's errorbar plots aggregate the same essential-save points
    (slurm_bc.py grid + main_bc_2 essential-save protocol)."""
    rows = []
    for encoder in (encoders or ENCODERS):
        finals, losses, curves = [], [], []
        for run_id in run_ids:
            path = stats_path(workdir, scene, encoder, run_id)
            if not os.path.isfile(path):
                continue
            with open(path, "rb") as handle:
                s = pickle.load(handle)[scene]
            succ = [v for v in s["episode_success"]
                    if not (isinstance(v, float) and np.isnan(v))]
            if succ:
                finals.append(float(np.mean(succ[-FINAL_WINDOW:])))
                losses.append(float(s["training_loss"][-1]))
                curves.append([round(float(v), 2) for v in succ])
        rows.append((encoder, finals, losses, curves))
    print(f"\n=== encoder study: {scene}, {MAX_FRAMES / 1e6:.1f}M frames, "
          f"seeds {list(run_ids)} ===")
    print(f"{'encoder':14} {'n':>2} {'success mean+-std':>20} "
          f"{'final NLL':>10}  per-seed window means")
    for encoder, finals, losses, curves in rows:
        if not finals:
            print(f"{encoder:14}  0  {'(no completed runs)':>20}")
            continue
        mean, std = float(np.mean(finals)), float(np.std(finals))
        print(f"{encoder:14} {len(finals):>2} {mean:10.3f} +- {std:.3f} "
              f"{float(np.mean(losses)):10.3f}  "
              f"{[round(f, 3) for f in finals]}")
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--scene", type=str, default="FakePointNav-room_0")
    parser.add_argument("--n_trajectories", type=int, default=10000)
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--collate", action="store_true",
                        help="Only collate whatever runs are complete.")
    parser.add_argument("--bc_timeout", type=int, default=5400)
    parser.add_argument("--abort_on_fail", type=int, default=0,
                        help="Abort the pass after N consecutive BC "
                             "failures (0 = keep going). A wedged TPU "
                             "tunnel fails every run the same way "
                             "(~25 min each at backend init), so an "
                             "outer retry loop wants the pass to cost "
                             "one failure, not the whole grid.")
    parser.add_argument("--encoders", type=str, default="",
                        help="Comma list overriding the default five.")
    args = parser.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    run_ids = range(1, args.seeds + 1)
    encoders = args.encoders.split(",") if args.encoders else ENCODERS
    log = os.path.join(args.workdir, "study.log")

    if args.collate:
        collate(args.workdir, args.scene, run_ids, encoders)
        return

    t0 = time.time()
    assert stage_datagen(args.workdir, args.scene, args.n_trajectories,
                         log), "datagen failed"
    print(f"datagen done +{time.time() - t0:.0f}s", flush=True)

    # Anything that is not seed-dependent (random) or an oracle
    # (true_state) gets bulk-embedded once and shared across seeds.
    precomputed = [e for e in encoders
                   if e not in ("random", "true_state")]
    for encoder in encoders:
        if encoder in precomputed:
            ok = stage_embed(args.workdir, args.scene, encoder, log)
            print(f"embed {encoder}: {'ok' if ok else 'FAILED'} "
                  f"+{time.time() - t0:.0f}s", flush=True)

    # NOTE: true_state must come after the resnet50 embed stage — it
    # reads the resnet50-named pickle's true_state field
    # (reference main_bc_2.py:115-119; train/bc.py _load_precomputed).
    consecutive_failures = 0
    for run_id in run_ids:
        for encoder in encoders:
            if run_completed(args.workdir, args.scene, encoder, run_id):
                print(f"skip completed {encoder} s{run_id}", flush=True)
                continue
            rc = sh(bc_cmd(args.workdir, args.scene, encoder, run_id),
                    timeout=args.bc_timeout, log=log)
            print(f"bc {encoder} s{run_id}: rc={rc} "
                  f"+{time.time() - t0:.0f}s", flush=True)
            consecutive_failures = 0 if rc == 0 else consecutive_failures + 1
            if args.abort_on_fail and \
                    consecutive_failures >= args.abort_on_fail:
                print(f"ABORT pass: {consecutive_failures} consecutive "
                      "BC failures (tunnel likely wedged)", flush=True)
                collate(args.workdir, args.scene, run_ids, encoders)
                sys.exit(3)

    collate(args.workdir, args.scene, run_ids, encoders)


if __name__ == "__main__":
    main()
