"""High-episode offline re-evaluation of encoder-study checkpoints.

The study's in-training evals use 30 episodes per point (binomial se
~plus/minus 0.055 at p=0.1) — fine for curves, too noisy to rank
encoders whose final success differs by a few points.  This script
re-evaluates every completed (encoder, seed) checkpoint with a large
episode budget (default 200: se ~plus/minus 0.021) through the SAME
online protocol the trainer uses (train/evaluate.batched_test_fused —
one device dispatch per lockstep tick, per-env episode quotas,
reference main_bc_2.py:230-246 / src/test_model.py:4-22 semantics), so
the re-eval measures exactly what training measured, just with less
noise.

Results accumulate idempotently in {workdir}/reeval.pickle keyed by
(encoder, seed); rerunning after a tunnel outage resumes where it
stopped.

Usage:
  python scripts/reeval_study.py --workdir /root/study_enc \
      [--n_episodes 200] [--eval_batch 10] [--collate]
"""

import argparse
import copy
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.encoder_study import ENCODERS, stats_path

STAT_KEYS = ["episode_return", "episode_step", "episode_success"]


def _ckpt_path(workdir, scene, encoder, run_id):
    return stats_path(workdir, scene, encoder, run_id)[:-len(".pickle")] \
        + ".tar"


def _load_results(path):
    if os.path.isfile(path):
        with open(path, "rb") as handle:
            return pickle.load(handle)
    return {}


def ckpt_opt_count(path):
    """Optimizer step count inside the .tar — the run's training
    progress.  The re-eval cache keys on it so a checkpoint re-evaled
    mid-budget (tunnel outage pauses) is re-evaluated once the run has
    trained further, instead of the stale entry sticking forever."""
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    return int(payload["actor_model_optimizer_state_dict"]["count"])


def reeval_one(workdir, scene, encoder, run_id, n_episodes, eval_batch):
    """One checkpoint -> mean stats dict via the trainer's eval stack."""
    from pvr_habitat_tpu.envs.environment import make_environment
    from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
    from pvr_habitat_tpu.train.evaluate import (FusedPolicyRunner,
                                                PolicyRunner, batched_test,
                                                batched_test_fused)
    from pvr_habitat_tpu.utils import checkpoint as ckpt
    from pvr_habitat_tpu.utils.flags import default_flags

    payload = ckpt.load_checkpoint(_ckpt_path(workdir, scene, encoder,
                                              run_id))
    params, batch_stats = ckpt.split_actor_state(
        payload["actor_model_state_dict"])
    runner = PolicyRunner(params, batch_stats,
                          batch_norm="fc.0.running_mean" in batch_stats)

    # Mirror train/bc.py's eval-time encoder exactly: pretrained=True +
    # checkpoint_dir resolves the persisted random_{id}.tar for
    # embed-at-load runs and the seeded init for checkpoint-less
    # architectures (bit-identical to what the embed stage used).
    flags = default_flags(
        env=scene, to_env=scene, data_path=workdir,
        embedding_name=encoder, run_id=run_id,
        max_episode_steps=100, eval_batch=eval_batch)
    embedding = EmbeddingNet(encoder, in_channels=3, pretrained=True,
                             train=False, checkpoint_dir=workdir,
                             run_id=run_id)

    env_flags = copy.copy(flags)
    fused = encoder != "true_state"
    if fused:
        envs = [make_environment(env_flags, None, actor_id=1 + i)
                for i in range(eval_batch)]
        stats = batched_test_fused(FusedPolicyRunner(runner, embedding),
                                   envs, STAT_KEYS, n_episodes)
    else:
        envs = [make_environment(env_flags, embedding, actor_id=1 + i)
                for i in range(eval_batch)]
        stats = batched_test(runner, envs, STAT_KEYS, n_episodes)
    for env in envs:
        env.close()
    return {k: [float(v) for v in stats[k]] for k in STAT_KEYS}


def collate(results, seeds):
    print(f"\n=== re-eval ({len(results)} runs) ===")
    print(f"{'encoder':14} {'n':>2} {'success mean+-se':>18} "
          f"{'return':>8} {'steps':>7}  per-seed")
    # Report every encoder present in the results (not just the default
    # study list): --encoders additions must show up in the collation.
    extras = sorted({e for e, _ in results} - set(ENCODERS))
    for encoder in ENCODERS + extras:
        per_seed = [results[(encoder, s)] for s in seeds
                    if (encoder, s) in results]
        if not per_seed:
            continue
        succ = [float(np.mean(r["episode_success"])) for r in per_seed]
        ret = [float(np.mean(r["episode_return"])) for r in per_seed]
        steps = [float(np.mean(r["episode_step"])) for r in per_seed]
        n_ep = sum(len(r["episode_success"]) for r in per_seed)
        pooled = float(np.mean(
            [v for r in per_seed for v in r["episode_success"]]))
        se = (pooled * (1 - pooled) / max(n_ep, 1)) ** 0.5
        print(f"{encoder:14} {len(per_seed):>2} "
              f"{pooled:8.3f} +- {se:.3f} {float(np.mean(ret)):8.2f} "
              f"{float(np.mean(steps)):7.1f}  "
              f"{[round(v, 3) for v in succ]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--scene", type=str, default="FakePointNav-room_0")
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--n_episodes", type=int, default=200)
    parser.add_argument("--eval_batch", type=int, default=10)
    parser.add_argument("--encoders", type=str, default="")
    parser.add_argument("--collate", action="store_true")
    args = parser.parse_args()

    from pvr_habitat_tpu.utils.platform import configure_platform

    configure_platform()  # honor PVR_TPU_PLATFORM before backend init

    out = os.path.join(args.workdir, "reeval.pickle")
    results = _load_results(out)
    seeds = range(1, args.seeds + 1)
    encoders = args.encoders.split(",") if args.encoders else ENCODERS

    if args.collate:
        collate(results, seeds)
        return

    for run_id in seeds:
        for encoder in encoders:
            key = (encoder, run_id)
            path = _ckpt_path(args.workdir, args.scene, encoder, run_id)
            if not os.path.isfile(path):
                print(f"skip {key} (no checkpoint)", flush=True)
                continue
            count = ckpt_opt_count(path)
            # Legacy cache entries (pre-opt-count keying) default to -1,
            # never `count`: otherwise exactly the stale mid-budget
            # re-evals the keying was added to refresh would be treated
            # as permanently current (ADVICE r3).
            if key in results and \
                    results[key].get("_opt_count", -1) == count:
                print(f"skip {key} (done @{count})", flush=True)
                continue
            t0 = time.time()
            stats = reeval_one(args.workdir, args.scene, encoder, run_id,
                               args.n_episodes, args.eval_batch)
            stats["_opt_count"] = count
            results[key] = stats
            with open(out + ".tmp", "wb") as handle:
                pickle.dump(results, handle)
            os.replace(out + ".tmp", out)
            print(f"{key}: success "
                  f"{float(np.mean(stats['episode_success'])):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    collate(results, seeds)


if __name__ == "__main__":
    main()
