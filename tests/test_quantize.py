"""int8 W8A8 encoder path: quantization machinery and accuracy of the
quantized ResNet-50 vs the f32 reference (opt-in fast path — bounded
error, NOT the 1e-3 parity contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import resnet
from pvr_habitat_tpu.ops import quantize as q
from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn
from pvr_habitat_tpu.ops.image import default_preprocess


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    w_q, scale = q.quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (16,)
    deq = w_q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w)).max()
    assert err <= float(np.abs(np.asarray(w)).max()) / 127.0 + 1e-6


@pytest.mark.slow
def test_int8_compressed_variant():
    """l4 cut runs through the quantized path with the right dims."""
    spec = resnet.ResNetSpec(50, cut="l4")
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(5)))
    params_q = q.quantize_resnet_params(params)
    x = default_preprocess()(jnp.asarray(
        np.random.RandomState(6).randint(0, 256, (1, 64, 64, 3), np.uint8)))
    out, scales = resnet.apply_int8(params_q, x, spec)
    assert out.shape == (1, 2058)
    want = np.asarray(resnet.apply(params, x, spec))
    got = np.asarray(out)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.98, cos


@pytest.mark.slow
def test_sharded_embedder_int8():
    from pvr_habitat_tpu.data.embed_pipeline import ShardedEmbedder
    from pvr_habitat_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh((8, 1))
    emb = ShardedEmbedder("resnet50", mesh=mesh, batch_size=8,
                          pretrained=False, quantize=True)
    frames = np.random.RandomState(0).randint(
        0, 256, size=(10, 64, 64, 3), dtype=np.uint8)
    out = emb.embed_all(frames)
    assert out.shape == (10, 2048)
    ref = ShardedEmbedder("resnet50", mesh=mesh, batch_size=8,
                          pretrained=False,
                          compute_dtype=jnp.float32).embed_all(frames)
    cos = (out * ref).sum(-1) / (np.linalg.norm(out, axis=-1)
                                 * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.99, cos


@pytest.mark.slow
def test_int8_clip_rn50():
    from pvr_habitat_tpu.models import clip as clip_mod
    from pvr_habitat_tpu.ops.image import clip_preprocess

    params = clip_mod.init_clip_rn50_params(np.random.RandomState(7))
    params = fold_resnet_bn(params)
    params_q = q.quantize_resnet_params(params)
    x = clip_preprocess(224)(jnp.asarray(
        np.random.RandomState(8).randint(0, 256, (1, 64, 64, 3), np.uint8)))
    out, scales = clip_mod.clip_rn50_apply_int8(params_q, x)
    scales = {k: float(v) for k, v in scales.items()}
    out2, _ = clip_mod.clip_rn50_apply_int8(params_q, x, scales=scales)
    want = np.asarray(clip_mod.clip_rn50_apply(params, x))
    got = np.asarray(out2)
    assert got.shape == want.shape == (1, 1024)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.98, cos


@pytest.mark.slow
def test_int8_mae():
    from pvr_habitat_tpu.models import vit
    from pvr_habitat_tpu.ops.image import mae_preprocess

    depth, heads, patch, dim = 2, 4, 16, 96
    # small config through the same code path
    params = vit.init_mae_params("mae_base", np.random.RandomState(9))
    # shrink: take a tiny handmade config instead
    rng = np.random.RandomState(9)
    params = {}
    import math

    def xavier(shape):
        a = math.sqrt(6.0 / sum(shape))
        return jnp.asarray(rng.uniform(-a, a, shape).astype(np.float32))

    params["patch_embed.proj.weight"] = xavier((patch, patch, 3, dim))
    params["patch_embed.proj.bias"] = jnp.zeros(dim)
    params["cls_token"] = xavier((1, 1, dim))
    params["pos_embed"] = jnp.asarray(
        vit.sincos_pos_embed_2d(dim, 224 // patch, True)[None])
    for i in range(depth):
        pre = f"blocks.{i}"
        params[f"{pre}.norm1.weight"] = jnp.ones(dim)
        params[f"{pre}.norm1.bias"] = jnp.zeros(dim)
        params[f"{pre}.attn.qkv.weight"] = xavier((3 * dim, dim))
        params[f"{pre}.attn.qkv.bias"] = jnp.zeros(3 * dim)
        params[f"{pre}.attn.proj.weight"] = xavier((dim, dim))
        params[f"{pre}.attn.proj.bias"] = jnp.zeros(dim)
        params[f"{pre}.norm2.weight"] = jnp.ones(dim)
        params[f"{pre}.norm2.bias"] = jnp.zeros(dim)
        params[f"{pre}.mlp.fc1.weight"] = xavier((4 * dim, dim))
        params[f"{pre}.mlp.fc1.bias"] = jnp.zeros(4 * dim)
        params[f"{pre}.mlp.fc2.weight"] = xavier((dim, 4 * dim))
        params[f"{pre}.mlp.fc2.bias"] = jnp.zeros(dim)
    params["norm.weight"] = jnp.ones(dim)
    params["norm.bias"] = jnp.zeros(dim)

    x = mae_preprocess()(jnp.asarray(
        np.random.RandomState(10).randint(0, 256, (2, 64, 64, 3), np.uint8)))
    want = np.asarray(vit.mae_apply(params, x, depth=depth,
                                    num_heads=heads, patch=patch))
    params_q = q.quantize_vit_params(params)
    out, scales = vit.mae_apply_int8(params_q, x, depth=depth,
                                     num_heads=heads, patch=patch)
    scales = {k: float(v) for k, v in scales.items()}
    got, _ = vit.mae_apply_int8(params_q, x, depth=depth, num_heads=heads,
                                patch=patch, scales=scales)
    got = np.asarray(got)
    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.98, cos


@pytest.mark.slow
def test_int8_resnet_accuracy():
    spec = resnet.ResNetSpec(50)
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(2)))
    params_q = q.quantize_resnet_params(params)

    rng = np.random.RandomState(3)
    pre = default_preprocess()
    calib = pre(jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3), np.uint8)))
    test_x = pre(jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3), np.uint8)))

    # calibration pass computes activation scales
    _, scales = resnet.apply_int8(params_q, calib, spec)
    scales = {k: float(v) for k, v in scales.items()}

    got, _ = resnet.apply_int8(params_q, test_x, spec, scales=scales)
    want = resnet.apply(params, test_x, spec)

    got = np.asarray(got)
    want = np.asarray(want)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    rel = np.linalg.norm(got - want, axis=-1) / np.linalg.norm(want, axis=-1)
    assert cos.min() > 0.99, cos
    assert rel.max() < 0.15, rel


@pytest.mark.slow
def test_int8_bench_gate_on_fakenav_data():
    """Accuracy gate certifying int8 W8A8 as the bench.py DEFAULT
    (round-1 VERDICT item 2): on REAL FakeNav frames (not noise), the
    int8 embeddings must stay cosine > 0.99 to f32, and a BC policy
    trained on int8 embeddings must reach teacher-forced training loss
    within 10% of one trained on f32 embeddings (same data, same
    seeds)."""
    from pvr_habitat_tpu.data.embed_pipeline import ShardedEmbedder
    from pvr_habitat_tpu.envs.environment import make_environment
    from pvr_habitat_tpu.parallel import mesh as pmesh
    from pvr_habitat_tpu.train import bc_step
    from pvr_habitat_tpu.utils.flags import default_flags

    # real frames: roll FakeNav with random actions
    flags = default_flags(env="FakePointNav-hotel_0",
                          embedding_name="resnet50",
                          max_episode_steps=16)
    env = make_environment(flags, None)
    rng = np.random.RandomState(0)
    frames, actions, dones = [], [], []
    out = env.initial()
    for _ in range(64):
        frames.append(np.asarray(out["obs"])[0, 0])
        a = rng.randint(0, 3)
        actions.append(a)
        out = env.step(np.array([[a]]))
        dones.append(bool(out["done"][0, 0]))
    env.close()
    frames = np.stack(frames)          # (64, H, W, 3) uint8

    # single-device mesh: the int8-vs-f32 numerics don't depend on
    # sharding (covered by test_sharded_embedder_int8) and the 8-way
    # SPMD resnet50 compile dominates CPU-CI time otherwise.
    mesh = pmesh.make_mesh((1, 1), devices=jax.devices("cpu")[:1])
    emb_q = ShardedEmbedder("resnet50", mesh=mesh, batch_size=16,
                            pretrained=False, quantize=True)
    emb_f = ShardedEmbedder("resnet50", mesh=mesh, batch_size=16,
                            pretrained=False, compute_dtype=jnp.float32)
    got = emb_q.embed_all(frames)
    want = emb_f.embed_all(frames)
    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.99, cos.min()

    # downstream gate: BC training loss parity on the two embeddings
    def train_loss(embeds):
        t, b = 16, 4
        batch = dict(
            obs=embeds.reshape(t, b, -1).astype(np.float32),
            action=np.asarray(actions, np.int32).reshape(t, b),
            done=np.asarray(dones, bool).reshape(t, b),
        )
        train_flags = default_flags(learning_rate=1e-3)
        state, opt = bc_step.create_train_state(
            np.random.RandomState(1), (embeds.shape[1],), 3, train_flags,
            max_epochs=60)
        step = bc_step.make_train_step(opt, donate=False)
        loss = None
        for _ in range(60):
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])
        return loss

    loss_q = train_loss(got)
    loss_f = train_loss(want)
    assert abs(loss_q - loss_f) <= 0.1 * max(loss_f, 1e-3), \
        (loss_q, loss_f)


@pytest.mark.slow
def test_quantize_embed_cli(tmp_path):
    """--quantize_embed on the bulk-embed CLI routes through the int8
    ShardedEmbedder and writes an embedded pickle whose rows stay
    cosine-close to the default path's output."""
    import shutil

    from pvr_habitat_tpu.data import formats
    from pvr_habitat_tpu.tools.save_embedded_obs import (build_tool_parser,
                                                         run as embed_run)
    from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
    from pvr_habitat_tpu.utils.flags import default_flags

    env = "FakePointNav-office_0"
    gen = default_flags(env=env, save_path=str(tmp_path),
                        max_episode_steps=12)
    gen.n_trajectories = 2
    gen_data_habitat(gen)

    dirs = {}
    for name in ("f32", "int8"):
        d = tmp_path / name
        d.mkdir()
        shutil.copy(formats.raw_path(str(tmp_path), env),
                    formats.raw_path(str(d), env))
        dirs[name] = str(d)

    def embed(data_path, quantized):
        args = ["--env", env, "--data_path", data_path,
                "--embedding_name", "resnet50", "--source", "pickle",
                "--batch_size", "16", "--mesh_shape", "1,1",
                "--disable_pretrained_embedding"]
        if quantized:
            args.append("--quantize_embed")
        flags = build_tool_parser().parse_args(args)
        return embed_run(flags)

    want = np.asarray(formats.load_pickle(
        embed(dirs["f32"], quantized=False))["obs"], np.float32)
    got = np.asarray(formats.load_pickle(
        embed(dirs["int8"], quantized=True))["obs"], np.float32)
    assert got.shape == want.shape
    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.98, cos.min()


@pytest.mark.slow
def test_int8_basic_block_resnet18():
    """The basic-block family (resnet18/34) runs the W8A8 path too."""
    spec = resnet.ResNetSpec(18)
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(11)))
    params_q = q.quantize_resnet_params(params)
    x = default_preprocess()(jnp.asarray(
        np.random.RandomState(12).randint(0, 256, (2, 64, 64, 3),
                                          np.uint8)))
    out, scales = resnet.apply_int8(params_q, x, spec)
    assert out.shape == (2, 512)
    scales = {k: float(v) for k, v in scales.items()}
    out2, _ = resnet.apply_int8(params_q, x, spec, scales=scales)
    want = np.asarray(resnet.apply(params, x, spec))
    got = np.asarray(out2)
    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.98, cos


@pytest.mark.slow
def test_int8_maskrcnn_l3():
    """The last zoo family to get a W8A8 path (VERDICT r3 #5): the
    detectron2-style '<conv>.norm' FrozenBN pairs fold like eval-mode
    BN (f32 parity of folded vs unfolded), and the int8 serving path
    clears the same cosine gate as the other ResNet-C4 profiles."""
    from pvr_habitat_tpu.models import maskrcnn
    from pvr_habitat_tpu.models.registry import int8_serving_fns
    from pvr_habitat_tpu.ops.image import maskrcnn_preprocess

    params = maskrcnn.init_params(np.random.RandomState(7))
    x = maskrcnn_preprocess()(jnp.asarray(
        np.random.RandomState(8).randint(0, 256, (2, 64, 64, 3),
                                         np.uint8)))
    want = np.asarray(maskrcnn.apply(params, x))

    folded = fold_resnet_bn(params)
    got_folded = np.asarray(maskrcnn.apply(folded, x))
    np.testing.assert_allclose(got_folded, want, atol=1e-3, rtol=1e-3)

    quantize_params, apply_q = int8_serving_fns("maskrcnn_l3")
    params_q = quantize_params(folded)
    out, scales = apply_q(params_q, x, None)          # calibrate
    assert out.shape == (2, 2156)
    out2, _ = apply_q(params_q, x, scales)            # serve
    for got in (np.asarray(out), np.asarray(out2)):
        cos = (got * want).sum() / (np.linalg.norm(got)
                                    * np.linalg.norm(want))
        assert cos > 0.98, cos
