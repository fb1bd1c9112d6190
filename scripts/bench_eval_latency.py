"""Online-eval latency on the real chip (SURVEY §3.4's
latency-sensitive path): per-simulator-tick milliseconds for a
ResNet-50 ImageNav rollout — encoder + LSTM policy every tick — at
eval_batch K in {1, 5, 20}.

  python scripts/bench_eval_latency.py [--ticks 300]

K=1 is the reference protocol (batch-1 encoder+policy per step,
src/test_model.py); K>1 is the lockstep batched path where all K envs'
frames embed in ONE device call per tick (batched_test_embedded)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(k, ticks):
    from pvr_habitat_tpu.envs.environment import make_environment
    from pvr_habitat_tpu.models import policy as policy_mod
    from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
    from pvr_habitat_tpu.train.evaluate import PolicyRunner
    from pvr_habitat_tpu.utils.flags import default_flags

    from pvr_habitat_tpu.train.evaluate import FusedPolicyRunner

    import jax.numpy as jnp

    # ImageNav: 6-channel obs (frame ++ goal) split into two
    # 3-channel frames before embedding, as the wrappers do.
    # bf16 serving grade (FusedPolicyRunner honors the encoder dtype;
    # the recorded DESIGN.md table is the bf16 path).
    embedding = EmbeddingNet("resnet50", pretrained=False,
                             compute_dtype=jnp.bfloat16)
    flags = default_flags(env="FakeImageNav-hotel_0",
                          embedding_name="resnet50",
                          max_episode_steps=200)
    envs = [make_environment(flags, None, actor_id=i + 1) for i in range(k)]
    params, stats = policy_mod.init_policy_params(
        np.random.RandomState(0), 2 * embedding.out_size, 3)
    fused = FusedPolicyRunner(PolicyRunner(params, stats), embedding)

    outs = [env.initial() for env in envs]
    state = fused.initial_state(batch_size=k)

    def tick(outs, state):
        frames = []
        for out in outs:
            img = np.asarray(out["obs"])[0, 0]
            frames.extend(np.split(img, 2, axis=-1))
        done = np.concatenate([o["done"] for o in outs], axis=1)
        actions, state = fused.tick(np.stack(frames), done, state,
                                    n_frames=2)
        return [env.step(actions[i]) for i, env in enumerate(envs)], state

    for _ in range(10):  # warmup: compile embed + policy step
        outs, state = tick(outs, state)
    start = time.perf_counter()
    for _ in range(ticks):
        outs, state = tick(outs, state)
    elapsed = time.perf_counter() - start
    for env in envs:
        env.close()
    ms_per_tick = elapsed / ticks * 1000
    return dict(eval_batch=k,
                ms_per_tick=round(ms_per_tick, 2),
                ms_per_episode_step_per_env=round(ms_per_tick / k, 3),
                env_steps_per_sec=round(k * ticks / elapsed, 1))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ticks", type=int, default=300)
    parser.add_argument("--batches", type=str, default="1,5,20")
    args = parser.parse_args()
    for k in (int(s) for s in args.batches.split(",")):
        print(json.dumps(measure(k, args.ticks)))


if __name__ == "__main__":
    main()
