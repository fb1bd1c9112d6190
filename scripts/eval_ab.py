"""A/B a trained BC checkpoint's ONLINE action rule: greedy argmax
(the reference's eval rule, src/test_model.py + src/models.py:82) vs
multinomial sampling (its train-mode rule, src/models.py:78-82).

Why (VERDICT r3 #4): argmax policies can deadlock in action loops
(turn-left/turn-right oscillation) that sampling breaks for free; this
measures whether the study checkpoints' low online success is partly an
action-rule artifact.  Runs the SAME batched eval protocol as training
and the re-evals (per-env episode quotas).

Usage:
  PVR_TPU_PLATFORM=cpu python scripts/eval_ab.py \
      --workdir /root/study_enc --encoder resnet50 --run_id 1 \
      --n_episodes 200
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
                                            batched_test_embedded)
from pvr_habitat_tpu.utils import checkpoint as ckpt  # noqa: E402
from pvr_habitat_tpu.utils.flags import default_flags  # noqa: E402

STAT_KEYS = ["episode_return", "episode_step", "episode_success"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--scene", type=str, default="FakePointNav-room_0")
    parser.add_argument("--encoder", type=str, default="random")
    parser.add_argument("--run_id", type=int, default=1)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="explicit .tar (default: study layout)")
    parser.add_argument("--n_episodes", type=int, default=200)
    parser.add_argument("--eval_batch", type=int, default=10)
    args = parser.parse_args()

    path = args.checkpoint or os.path.join(
        args.workdir, "bc",
        f"{args.scene}_em{args.encoder}_s{args.run_id}_{args.scene}.tar")
    payload = ckpt.load_checkpoint(path)
    params, batch_stats = ckpt.split_actor_state(
        payload["actor_model_state_dict"])
    batch_norm = "fc.0.running_mean" in batch_stats

    embedding = EmbeddingNet(args.encoder, in_channels=3, pretrained=True,
                             train=False, checkpoint_dir=args.workdir,
                             run_id=args.run_id)
    flags = default_flags(env=args.scene, to_env=args.scene,
                          data_path=args.workdir,
                          embedding_name=args.encoder, run_id=args.run_id,
                          max_episode_steps=100,
                          eval_batch=args.eval_batch)

    for mode, runner in (
            ("argmax", PolicyRunner(params, batch_stats,
                                    batch_norm=batch_norm)),
            ("sample", PolicyRunner(params, batch_stats,
                                    batch_norm=batch_norm, sample=True))):
        env_flags = copy.copy(flags)
        envs = [make_environment(env_flags, None, actor_id=1 + i)
                for i in range(args.eval_batch)]
        stats = batched_test_embedded(runner, envs, embedding, STAT_KEYS,
                                      args.n_episodes)
        for env in envs:
            env.close()
        succ = np.asarray(stats["episode_success"])
        se = (succ.mean() * (1 - succ.mean()) / len(succ)) ** 0.5
        print(f"{mode}: success {succ.mean():.3f} +- {se:.3f} "
              f"return {np.mean(stats['episode_return']):.2f} "
              f"steps {np.mean(stats['episode_step']):.1f} "
              f"(n={len(succ)})", flush=True)


if __name__ == "__main__":
    main()
