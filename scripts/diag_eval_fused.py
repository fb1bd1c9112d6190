"""Stage E of the eval-protocol dissection (see diag_eval_protocol.py):
the batched_test_FUSED path — the exact evaluator the trainer and
reeval_study used for every 10-17% number — on the same checkpoint and
env seeds as stages A-D.  Run it on the same platform those numbers
came from (TPU) first; a CPU rerun then separates fused-path effects
from device numerics.

Usage:
  python scripts/diag_eval_fused.py --workdir /root/study_pc \
      [--episodes 200] [--eval_batch 5]
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
from pvr_habitat_tpu.train.evaluate import (FusedPolicyRunner,  # noqa: E402
                                            PolicyRunner, batched_test_fused)
from pvr_habitat_tpu.utils import checkpoint as ckpt  # noqa: E402
from pvr_habitat_tpu.utils.flags import default_flags  # noqa: E402


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
    raw_envs = [make_environment(copy.deepcopy(flags), None, actor_id=1 + i)
                for i in range(args.eval_batch)]
    fused = FusedPolicyRunner(runner, embedding)
    s = batched_test_fused(
        fused, raw_envs,
        ["episode_return", "episode_step", "episode_success"],
        args.episodes)
    succ = np.asarray(s["episode_success"], np.float64)
    print(f"E (fused, K={args.eval_batch}): success {succ.mean():.3f} +- "
          f"{succ.std() / max(len(succ), 1) ** 0.5:.3f} (n={len(succ)}) "
          f"steps {np.mean(s['episode_step']):.1f}", flush=True)


if __name__ == "__main__":
    main()
