"""Worker for the 2-process localhost multi-host TRAINING test.

Each process: 4 virtual CPU devices; ``--coordinator``-style flags make
bc.run initialize jax.distributed itself (the same path a real
multi-host launch takes), the ('data','model') mesh spans the 8-device
world, and the BC grad all-reduce rides the cross-process collectives.
Writes the stats trajectory to an .npz for the parent to compare across
ranks.

Usage: python multihost_train_worker.py <coordinator> <num_procs> <rank>
       <data_path> <save_path> <out.npz>
"""

import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    coordinator, num_procs, rank, data_path, save_path, out_path = \
        sys.argv[1:7]
    num_procs, rank = int(num_procs), int(rank)

    xla_flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pvr_habitat_tpu.train import bc
    from pvr_habitat_tpu.utils.flags import default_flags

    env = "FakePointNav-hotel_0"
    flags = default_flags(
        env=env, to_env=env, embedding_name="true_state",
        data_path=data_path, save_path=save_path,
        batch_size=8, unroll_length=10, max_frames=160,
        eval_frequency=1, n_episodes_test=1, max_episode_steps=10,
        mesh_shape=f"{4 * num_procs},1", disable_save=True,
        coordinator=coordinator, num_processes=num_procs,
        process_id=rank)
    stats = bc.run(flags, mode="precomputed")
    assert jax.process_count() == num_procs, jax.process_count()

    np.savez(out_path,
             loss=np.asarray(stats[env]["training_loss"], np.float64),
             gnorm=np.asarray(stats[env]["gradient_norm"], np.float64),
             ret=np.asarray(stats[env]["episode_return"], np.float64))
    print(f"rank {rank}: trained, loss tail "
          f"{stats[env]['training_loss'][-1]:.6f}")


if __name__ == "__main__":
    main()
