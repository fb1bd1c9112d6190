"""End-to-end learning validation on the hermetic FakeNav simulator.

Generates expert trajectories, embeds them with the 'random' encoder,
trains BC (lr 1e-3 + batch_norm for speed; the reference's 1e-4 works
with more budget), and evaluates online.  Defaults (5k trajectories /
3k epochs): episode success rises 0 -> ~0.16 -> ~0.24 on round-1
scenes, ~0.15 on the harder round-2 room_0 (TPU: ~25 min datagen on
one CPU core + minutes of training).  --n_trajectories 10000 matches
the paper's per-scene dataset scale.

Demonstrates the whole pipeline learns: expert data -> encoder ->
BC -> online navigation.  (The true_state variant exhibits the classic
BC latching pathology — the LSTM shortcuts to action repetition — which
pixel observations avoid; see docs/DESIGN.md.)
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.tools.save_embedded_obs import run as embed_run
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.train.bc import run as bc_run
from pvr_habitat_tpu.utils.flags import default_flags


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="FakePointNav-room_0")
    parser.add_argument("--n_trajectories", type=int, default=5000)
    parser.add_argument("--epochs", type=int, default=3000)
    parser.add_argument("--eval_frequency", type=int, default=750)
    parser.add_argument("--workdir", type=str, default="",
                        help="Reuse a directory (skips completed datagen"
                             "/embed stages); default: fresh tempdir.")
    args = parser.parse_args()

    tmp = args.workdir or tempfile.mkdtemp()
    os.makedirs(tmp, exist_ok=True)
    env = args.env
    print("workdir", tmp, flush=True)

    from pvr_habitat_tpu.data import formats

    if not os.path.isfile(formats.raw_path(tmp, env)):
        flags = default_flags(env=env, save_path=tmp,
                              max_episode_steps=100)
        flags.n_trajectories = args.n_trajectories
        t0 = time.time()
        gen_data_habitat(flags)
        print("datagen %.0fs" % (time.time() - t0), flush=True)

    eflags = default_flags(env=env, data_path=tmp,
                           embedding_name="random", batch_size=256)
    eflags.n_trajectories = -1
    eflags.source = "pickle"
    t0 = time.time()
    embed_run(eflags)                     # idempotent skip if present
    print("embed %.0fs" % (time.time() - t0), flush=True)

    bc = default_flags(
        env=env, to_env=env, data_path=tmp,
        save_path=os.path.join(tmp, "bc"), embedding_name="random",
        batch_size=32, unroll_length=100, learning_rate=1e-3,
        batch_norm=True, max_frames=32 * 100 * args.epochs,
        eval_frequency=args.eval_frequency, n_episodes_test=20,
        max_episode_steps=100, eval_batch=5)
    t0 = time.time()
    stats = bc_run(bc, mode="precomputed")
    s = stats[env]
    print("total %.0fs" % (time.time() - t0), flush=True)
    print("success:", [round(v, 2) for v in s["episode_success"]],
          flush=True)
    print("return:", [round(v, 2) for v in s["episode_return"]],
          flush=True)
    print("loss:", [round(float(v), 3) for v in s["training_loss"]],
          flush=True)


if __name__ == "__main__":
    main()
