"""Probe the batch-1 vs batched online-eval discrepancy (round 5).

diag_control_divergence's lockstep/test() probes (batch-1 env,
EmbeddingWrapper path) measured the SAME control checkpoint at ~1.5%
online success that the training-time batched evals (eval_batch=5,
raw envs + one embed dispatch per tick) scored at 10-15% — while
torch-vs-jax at matched protocol agree (1.0% vs 1.5%).  The "18x
torch-vs-jax divergence" (VERDICT r3/r4) was therefore never an
implementation gap; it is a PROTOCOL gap.  This script isolates which
ingredient moves the number, on one checkpoint:

  A. serial test() on each of the 5 training-eval envs
     (actor_id 1..5 — bc.py:228 seeds), 40 episodes each,
     EmbeddingWrapper (embed-in-env) path;
  B. batched_test_embedded, SAME 5 env seeds, 200 episodes
     (the protocol that produced every study number);
  C. batched_test_embedded with K=1 (actor_id 1), 200 episodes —
     separates "batched machinery" from "seed mixture";
  D. serial test() with K=1 (actor_id 1) — the diag/torch-control
     protocol, 200 episodes.

If B >> A=C=D: the batched path at K>1 inflates (bug).
If B=C >> A=D: raw-env+batched-embed differs from EmbeddingWrapper
(preprocess divergence).  If B=A >> C=D: episode-seed mixture.

Usage:
  PVR_TPU_PLATFORM=cpu python scripts/diag_eval_protocol.py \
      --workdir /root/study_pc [--episodes 200]
"""

import argparse
import copy
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.utils.platform import configure_platform

configure_platform()

from pvr_habitat_tpu.envs.environment import make_environment  # noqa: E402
from pvr_habitat_tpu.models.embedding_net import EmbeddingNet  # noqa: E402
from pvr_habitat_tpu.train.evaluate import (PolicyRunner,  # noqa: E402
                                            batched_test_embedded, test)
from pvr_habitat_tpu.utils import checkpoint as ckpt  # noqa: E402
from pvr_habitat_tpu.utils.flags import default_flags  # noqa: E402


def summarize(tag, stats):
    s = np.asarray(stats["episode_success"], np.float64)
    print(f"  {tag}: success {s.mean():.3f} +- "
          f"{s.std() / max(len(s), 1) ** 0.5:.3f} (n={len(s)}) "
          f"steps {np.mean(stats['episode_step']):.1f}", flush=True)
    return float(s.mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/root/study_pc")
    parser.add_argument("--env", type=str, default="FakePointNav-room_0")
    parser.add_argument("--encoder", type=str, default="random")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--episodes", type=int, default=200)
    parser.add_argument("--eval_batch", type=int, default=5)
    args = parser.parse_args()

    jpath = args.checkpoint or os.path.join(
        args.workdir, "bc",
        f"{args.env}_em{args.encoder}_s1_{args.env}.tar")
    payload = ckpt.load_checkpoint(jpath)
    params, stats = ckpt.split_actor_state(payload["actor_model_state_dict"])
    runner = PolicyRunner(params, stats, batch_norm=True)

    embedding = EmbeddingNet(args.encoder, in_channels=3, pretrained=True,
                             train=False, checkpoint_dir=args.workdir,
                             run_id=1)
    flags = default_flags(
        env=args.env, to_env=args.env, data_path=args.workdir,
        embedding_name=args.encoder, batch_norm=True,
        max_episode_steps=100)
    k = args.eval_batch
    per_env = args.episodes // k
    stat_keys = ["episode_return", "episode_step", "episode_success"]

    print(f"== A. serial test(), training-eval seeds (actor 1..{k}), "
          f"{per_env} eps each ==", flush=True)
    pooled = []
    for i in range(k):
        env = make_environment(copy.deepcopy(flags), embedding,
                               actor_id=1 + i)
        s = test(runner, env, stat_keys, per_env)
        summarize(f"actor {1 + i}", s)
        pooled.extend(s["episode_success"])
        env.close()
    print(f"  A pooled: {np.mean(pooled):.3f} (n={len(pooled)})",
          flush=True)

    print(f"== B. batched_test_embedded, same seeds, K={k}, "
          f"{args.episodes} eps ==", flush=True)
    raw_envs = [make_environment(copy.deepcopy(flags), None, actor_id=1 + i)
                for i in range(k)]
    s = batched_test_embedded(runner, raw_envs, embedding, stat_keys,
                              args.episodes)
    summarize("B", s)
    for env in raw_envs:
        env.close()

    print(f"== C. batched_test_embedded, K=1 (actor 1), "
          f"{args.episodes} eps ==", flush=True)
    raw = [make_environment(copy.deepcopy(flags), None, actor_id=1)]
    s = batched_test_embedded(runner, raw, embedding, stat_keys,
                              args.episodes)
    summarize("C", s)
    raw[0].close()

    print(f"== D. serial test(), K=1 (actor 1), {args.episodes} eps ==",
          flush=True)
    env = make_environment(copy.deepcopy(flags), embedding, actor_id=1)
    s = test(runner, env, stat_keys, args.episodes)
    summarize("D", s)
    env.close()


if __name__ == "__main__":
    main()
