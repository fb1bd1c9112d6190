"""Worker script for the 2-process localhost multi-host test.

Each process: 4 virtual CPU devices; jax.distributed joins them into an
8-device world. Embeds its process_slice of a deterministic frame set
through ShardedEmbedder.embed_local and writes the local rows + slice
bounds to an .npz for the parent test to validate.

Usage: python multihost_worker.py <coordinator> <num_procs> <rank> <out.npz>
"""

import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    coordinator, num_procs, rank, out_path = sys.argv[1:5]
    num_procs, rank = int(num_procs), int(rank)

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pvr_habitat_tpu.parallel import multihost

    multihost.initialize(coordinator, num_procs, rank)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from pvr_habitat_tpu.data.embed_pipeline import ShardedEmbedder
    from pvr_habitat_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh((4 * num_procs, 1))
    embedder = ShardedEmbedder("random", mesh=mesh, batch_size=16,
                               compute_dtype=jnp.float32, pretrained=False)

    n = 37  # ragged: exercises tail padding and uneven host slices
    frames = np.random.RandomState(0).randint(
        0, 256, size=(n, 64, 64, 3), dtype=np.uint8)
    start, stop = multihost.process_slice(n)
    local = embedder.embed_local(frames[start:stop])
    assert local.dtype == np.float32, local.dtype  # documented contract
    np.savez(out_path, local=local, start=start, stop=stop)
    print(f"rank {rank}: rows [{start}, {stop}) ok")


if __name__ == "__main__":
    main()
