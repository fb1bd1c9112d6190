"""pvr_habitat_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of the PVR-for-Control behavioral-cloning pipeline
(reference: sparisi/pvr_habitat, arXiv 2203.03580).

Layer map (bottom-up), mirroring the reference's de-facto layers but
re-architected TPU-first:

- ``envs``      — gym-free environment API, wrapper stack, hermetic FakeNav
                  simulator, optional Habitat adapter (host-side, CPU).
- ``ops``       — TPU compute primitives: matmul-based image resize /
                  preprocessing, ``lax.scan`` LSTM with done-masking,
                  BN folding, Pallas kernels for the hot blocks.
- ``models``    — encoder zoo (ResNet/MoCo/CLIP/MAE/MaskRCNN/random/uber/
                  true_state), PyTorch weight converters, policy networks.
- ``data``      — trajectory store (drop-in pickle/PNG/JPEG formats),
                  batch sampler, sharded bulk-embedding pipeline.
- ``train``     — unified BC trainer (the reference's main_bc_1/2/finetune
                  as one parameterized jitted train step), online evaluator.
- ``parallel``  — device mesh construction, sharding rules, collectives.
- ``utils``     — flags (drop-in compatible with reference src/arguments.py),
                  checkpointing, stats, seeding.
- ``tools``     — data generation, bulk embedding CLI, sweep runner,
                  standalone eval.
"""

__version__ = "0.1.0"
