"""Unified BC trainer.

One parameterized ``run(flags, mode)`` implements the reference's three
entry points (cited lines are the behavior contract):

- mode='precomputed'   — main_bc_2.py:26-262 (train on cached embeddings)
- mode='embed_at_load' — main_bc_1.py:26-274 (embed raw frames at load
                         time; required for the seed-dependent 'random'
                         encoder)
- mode='finetune'      — main_bc_finetune.py:25-247 (end-to-end conv
                         policy on raw pixels)

TPU-first: the dataset is device-resident when it fits, unroll gathering
is a jitted take, the train step is one compiled function, and metrics
stay on device between eval points (async dispatch — the host never
blocks inside the hot loop).
"""

import copy
import os
import random

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.data import formats, sampler
from pvr_habitat_tpu.envs.environment import make_environment
from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
from pvr_habitat_tpu.train import bc_step
from pvr_habitat_tpu.train.evaluate import PolicyRunner, batched_test, test
from pvr_habitat_tpu.utils import checkpoint as ckpt
from pvr_habitat_tpu.utils import stats as stats_util


def _embed_in_minibatches(embedding_model, obs, batch_size, limit=None):
    """Minibatched bulk embedding with the stacked-frame split/merge dance
    (reference: main_bc_1.py:127-138, save_embedded_obs.py:147-157).
    Device batches are dispatched asynchronously (one fetch at the end),
    so host-side staging overlaps TPU compute."""
    n = obs.shape[0] if limit is None else min(limit, obs.shape[0])
    obs = obs[:n]
    if obs.shape[-1] == 1:  # grayscale (Atari): repeat to RGB
        obs = np.repeat(obs, 3, -1)
    n_frames = max(obs.shape[3] // 3, 1)
    # (N, H, W, nf*3) -> (N*nf, H, W, 3): all frames through the encoder
    flat = np.concatenate(np.split(obs, n_frames, axis=3), axis=0) \
        if n_frames > 1 else obs
    embedded = embedding_model.embed_batches(flat, batch_size)
    if n_frames > 1:
        embedded = np.concatenate(np.split(embedded, n_frames, axis=0),
                                  axis=-1)
    return embedded[:n]


def _load_precomputed(flags, from_env):
    """main_bc_2.py:111-148 data loading."""
    parts = {k: [] for k in ("obs", "action", "reward", "done")}
    for env_id in from_env.split(","):
        if flags.embedding_name == "true_state":
            # true_state is saved with every embedding; prefer a pickle
            # the bulk embedder wrote FOR true_state itself, fall back
            # to resnet50's (the reference's implicit convention —
            # main_bc_2.py:111-148 assumes some embedded pickle exists).
            path = formats.embedded_path(flags.data_path, env_id,
                                         "true_state")
            if not os.path.isfile(path):
                path = formats.embedded_path(flags.data_path, env_id,
                                             "resnet50")
        else:
            path = formats.embedded_path(flags.data_path, env_id,
                                         flags.embedding_name)
        data = formats.load_pickle(path)
        n = (flags.batch_size * flags.unroll_length if flags.debug
             else data["obs"].shape[0])
        obs_key = "true_state" if flags.embedding_name == "true_state" \
            else "obs"
        parts["obs"].append(np.asarray(data[obs_key][:n]))
        for key in ("action", "reward", "done"):
            parts[key].append(np.asarray(data[key][:n]))
    return {k: np.concatenate(v) for k, v in parts.items()}


def _load_embed_at_load(flags, from_env, embedding_model):
    """main_bc_1.py:115-150 data loading."""
    parts = {k: [] for k in ("obs", "action", "reward", "done")}
    for env_id in from_env.split(","):
        data = formats.read_habitat_data(
            formats.raw_path(flags.data_path, env_id))
        n = (flags.batch_size * flags.unroll_length if flags.debug
             else data["obs"].shape[0])
        print("   passing observations through embedding model")
        embed_batch = getattr(flags, "embed_batch_size", 0) \
            or flags.batch_size
        parts["obs"].append(_embed_in_minibatches(
            embedding_model, data["obs"], embed_batch, limit=n))
        for key in ("action", "reward", "done"):
            parts[key].append(np.asarray(data[key][:n]))
    return {k: np.concatenate(v) for k, v in parts.items()}


def _load_finetune(flags, from_env):
    """main_bc_finetune.py:103-125: raw pixel trajectories."""
    parts = {k: [] for k in ("obs", "action", "reward", "done")}
    for env_id in from_env.split(","):
        data = formats.load_pickle(formats.raw_path(flags.data_path, env_id))
        n_traj = (flags.batch_size * flags.unroll_length if flags.debug
                  else len(data["obs"]))
        for key in ("obs", "action", "reward", "done"):
            parts[key].append(np.concatenate(data[key][:n_traj]))
    return {k: np.concatenate(v) for k, v in parts.items()}


def _make_mesh(flags):
    """('data','model') mesh for multi-chip runs.  Explicit opt-in via
    --mesh_shape (e.g. '4,2'); the batch axis must divide the data
    axis."""
    from pvr_habitat_tpu.parallel import mesh as pmesh

    shape = pmesh.parse_mesh_shape(flags.mesh_shape)
    if shape is None:
        return None
    mesh = pmesh.make_mesh(shape)
    assert flags.batch_size % mesh.shape["data"] == 0, \
        (flags.batch_size, dict(mesh.shape))
    return mesh


def _shard_state(mesh, state):
    """DP+TP placement of a fresh/restored TrainState on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pvr_habitat_tpu.parallel import mesh as pmesh

    params = pmesh.shard_params(mesh, state.params, pmesh.policy_param_spec)
    stats = pmesh.replicate(mesh, state.batch_stats)
    opt = state.opt_state
    opt = type(opt)(
        count=jax.device_put(opt.count, NamedSharding(mesh, P())),
        square_avg=pmesh.shard_params(mesh, opt.square_avg,
                                      pmesh.policy_param_spec),
        momentum_buf=opt.momentum_buf if opt.momentum_buf == () else
        pmesh.shard_params(mesh, opt.momentum_buf, pmesh.policy_param_spec),
    )
    rng = jax.device_put(state.rng, NamedSharding(mesh, P()))
    return bc_step.TrainState(params, stats, opt, rng)


def _evaluate(runner, eval_envs, stat_keys, n_episodes, embedding=None,
              cache=None):
    if len(eval_envs) > 1 and embedding is not None:
        # raw-frame envs; preprocess+encoder+policy fused into ONE
        # device dispatch per tick (see FusedPolicyRunner).  The fused
        # runner lives in the trainer-owned ``cache`` dict and is
        # refreshed with the current policy params — rebuilding it
        # would re-jit the whole encoder+policy step at every eval
        # point.
        from pvr_habitat_tpu.train.evaluate import (FusedPolicyRunner,
                                                    batched_test_fused)

        fused = None if cache is None else cache.get("fused_runner")
        if fused is None:
            fused = FusedPolicyRunner(runner, embedding)
            if cache is not None:
                cache["fused_runner"] = fused
        fused.update_policy(runner)
        return batched_test_fused(fused, eval_envs, stat_keys, n_episodes)
    if len(eval_envs) > 1:
        return batched_test(runner, eval_envs, stat_keys, n_episodes)
    return test(runner, eval_envs[0], stat_keys, n_episodes)


def run(flags, mode="precomputed"):
    flags = copy.copy(flags)
    from pvr_habitat_tpu.utils.platform import configure_platform

    configure_platform(flags)
    # Multi-host bring-up before any backend use (--coordinator).
    from pvr_habitat_tpu.parallel import multihost

    multihost.maybe_initialize(flags)
    # Fix seeds (reference: main_bc_2.py:28-31).
    np.random.seed(flags.run_id)
    random.seed(flags.run_id)

    if flags.debug:
        flags.n_episodes_test = int(min(2, flags.n_episodes_test))

    from_env = flags.env
    to_env = flags.to_env
    conv_policy = mode == "finetune"
    embedding_label = "random_finetuned" if conv_policy else None

    os.makedirs(flags.save_path, exist_ok=True)
    save_path = stats_util.run_save_path(flags, embedding_label)

    # Resume probe (main_bc_2.py:49-56).
    resume = False
    if os.path.isfile(save_path + ".pickle"):
        stats = stats_util.load_stats(save_path + ".pickle")
        if stats[to_env]["frames"][-1] >= flags.max_frames:
            print("   WARNING! This run was already completed. Stopping now.")
            return
        resume = True

    embedding_model = None
    if not conv_policy:
        embedding_model = EmbeddingNet(
            flags.embedding_name, in_channels=3,
            pretrained=flags.pretrained_embedding if mode == "embed_at_load"
            else True,
            train=False, checkpoint_dir=flags.data_path,
            run_id=flags.run_id,
            compute_dtype=jnp.bfloat16
            if flags.compute_dtype == "bfloat16" else jnp.float32)

    env_flags = copy.copy(flags)
    env_flags.env = to_env
    env = make_environment(env_flags, embedding_model)
    obs_shape = env.gym_env.observation_space.shape
    num_actions = env.gym_env.action_space.n
    eval_batched_embed = (flags.eval_batch > 1
                          and embedding_model is not None
                          and flags.embedding_name != "true_state"
                          and flags.num_input_frames == 1)
    if eval_batched_embed:
        # raw-frame envs; embedding happens jointly inside the evaluator
        eval_envs = [make_environment(env_flags, None, actor_id=1 + i)
                     for i in range(flags.eval_batch)]
    else:
        eval_envs = [env] + [
            make_environment(env_flags, embedding_model, actor_id=2 + i)
            for i in range(max(flags.eval_batch, 1) - 1)]

    mesh = _make_mesh(flags)
    max_epochs = flags.max_frames // (flags.unroll_length
                                      * flags.batch_size) + 1
    state, opt = bc_step.create_train_state(
        np.random.RandomState(flags.run_id), obs_shape, num_actions, flags,
        conv_policy=conv_policy, max_epochs=max_epochs, seed=flags.run_id)

    if resume:
        payload = ckpt.load_checkpoint(save_path + ".tar")
        if embedding_model is not None and \
                "embedding_model_state_dict" in payload:
            embedding_model.load_state_dict(
                payload["embedding_model_state_dict"])
        params, batch_stats = ckpt.split_actor_state(
            payload["actor_model_state_dict"])
        state = bc_step.TrainState(params, batch_stats,
                                   ckpt.restore_opt_state(payload),
                                   state.rng)
    if mesh is not None:
        state = _shard_state(mesh, state)
        print(f"   device mesh: {dict(mesh.shape)}")

    print("=== BC run ===")
    print("   embedding:", embedding_label or flags.embedding_name)
    print("   training environment(s):", from_env)
    print("   testing environment(s):", to_env)
    if flags.debug:
        print("   RUNNING IN DEBUG MODE!")

    print("=== Loading trajectories ===")
    if mode == "precomputed":
        data = _load_precomputed(flags, from_env)
    elif mode == "embed_at_load":
        data = _load_embed_at_load(flags, from_env, embedding_model)
    elif mode == "finetune":
        data = _load_finetune(flags, from_env)
    else:
        raise ValueError(f"unknown mode: {mode}")

    n_samples = len(data["reward"])
    assert len(data["obs"]) == len(data["action"]) == n_samples == \
        len(data["done"]), "data length does not match"
    assert n_samples > 0, "no data found"
    print("   total number of samples", n_samples)

    train_data = dict(
        obs=np.asarray(data["obs"], np.uint8 if conv_policy else np.float32),
        action=np.asarray(data["action"], np.int32),
        done=np.asarray(data["done"], bool),
    )
    on_device = False
    if mesh is None:
        train_data, on_device = sampler.maybe_device_put(
            train_data, mode=flags.data_on_device)
    elif flags.data_on_device != "never":
        # Mesh path: replicate the (small, embedded) dataset across
        # devices so the unroll gather runs inside the sharded step —
        # one dispatch per epoch, no per-epoch host gather / h2d puts.
        if sampler.dataset_nbytes(train_data) <= 2 * 1024 ** 3 or \
                flags.data_on_device == "always":
            from pvr_habitat_tpu.parallel import mesh as pmesh

            train_data = pmesh.replicate(mesh, {
                k: jnp.asarray(v) for k, v in train_data.items()})
            on_device = True

    stat_keys = list(stats_util.STAT_KEYS)
    # Trainer-owned cache for per-run jitted eval state (fused runner).
    eval_cache = {}
    # The encoder is frozen during BC training: fetch its state_dict to
    # host ONCE and reuse it at every checkpoint boundary.  The
    # reference re-serializes embedding_model.state_dict() per save
    # (main_bc_2.py:255) — free on torch/CPU, but through the TPU
    # tunnel it would re-download up to 343 MB (mae) per eval block.
    # File contents are identical.
    embedding_state_host = (embedding_model.state_dict()
                            if embedding_model is not None else None)

    def make_runner():
        return PolicyRunner(state.params, state.batch_stats,
                            batch_norm=flags.batch_norm,
                            conv_policy=conv_policy)

    if resume:
        print("=== Resuming previous run ===")
        stats = stats_util.load_stats(save_path + ".pickle")
        init_frames = stats[to_env]["frames"][-1]
        for key in ("frames", "training_loss", "gradient_norm"):
            print("  ", key, stats[to_env][key][-1])
    else:
        print("=== Initial evaluation ===")
        stats = stats_util.new_stats(to_env, stat_keys)
        stats_ep = _evaluate(make_runner(), eval_envs, stat_keys,
                             flags.n_episodes_test,
                             embedding_model if eval_batched_embed else None,
                             cache=eval_cache)
        stats_util.append_eval(stats, to_env, stats_ep, stat_keys)
        for k in stat_keys:
            print("  ", k, np.mean(stats_ep[k]))
        stats[to_env]["frames"].append(0)
        stats[to_env]["training_loss"].append(np.nan)
        stats[to_env]["gradient_norm"].append(np.nan)
        init_frames = 0

    # One device dispatch per epoch when the dataset is HBM-resident:
    # the unroll gather happens inside the jitted step (per-dispatch
    # tunnel latency would otherwise dominate the small BC step).  With
    # chunking (default when device-resident), a whole eval block of
    # epochs runs as one lax.scan dispatch — same math, same host RNG
    # stream, K× fewer device round-trips.
    fused_gather = on_device
    chunk_size = flags.train_chunk if flags.train_chunk > 0 else \
        (max(flags.eval_frequency, 1) if fused_gather else 1)
    chunked = fused_gather and chunk_size > 1
    if chunked:
        step_fn = bc_step.make_train_step_chunked(
            opt, flags.unroll_length, batch_norm=flags.batch_norm,
            conv_policy=conv_policy, max_grad_norm=flags.max_grad_norm,
            mesh=mesh)
    elif fused_gather:
        step_fn = bc_step.make_train_step_fused_gather(
            opt, flags.unroll_length, batch_norm=flags.batch_norm,
            conv_policy=conv_policy, max_grad_norm=flags.max_grad_norm,
            mesh=mesh)
    else:
        step_fn = bc_step.make_train_step(
            opt, batch_norm=flags.batch_norm, conv_policy=conv_policy,
            max_grad_norm=flags.max_grad_norm)

    print("=== Training policy ===")
    from pvr_habitat_tpu.utils import profiling

    frames_per_epoch = flags.batch_size * flags.unroll_length
    metrics = None
    timer = profiling.StepTimer(items_per_step=frames_per_epoch,
                                report_every=max(flags.eval_frequency, 1),
                                label="train")
    profile_ctx = profiling.trace(getattr(flags, "profile_dir", ""))
    profile_ctx.__enter__()
    frames = init_frames
    while frames < flags.max_frames:
        epoch = frames // frames_per_epoch
        if chunked:
            # One lax.scan dispatch to the next eval boundary (or end of
            # budget).  Starts are sampled host-side from the SAME RNG
            # stream in the same order as the per-epoch loop.
            boundary = (epoch // chunk_size + 1) * chunk_size
            ef = max(flags.eval_frequency, 1)
            eval_boundary = (epoch // ef + 1) * ef
            epochs_left = -(-(flags.max_frames - frames)
                            // frames_per_epoch)
            k = min(boundary - epoch, eval_boundary - epoch, epochs_left)
            starts_block = np.stack([np.asarray(
                sampler.sample_with_minimum_distance(
                    n=n_samples, k=flags.batch_size,
                    d=flags.unroll_length), np.int32)
                for _ in range(k)])
            state, metrics = step_fn(state, train_data,
                                     jnp.asarray(starts_block))
            frames += k * frames_per_epoch
            for _ in range(k):
                timer.tick()
        else:
            starts = sampler.sample_with_minimum_distance(
                n=n_samples, k=flags.batch_size, d=flags.unroll_length)
            if fused_gather:
                state, metrics = step_fn(
                    state, train_data,
                    jnp.asarray(np.asarray(starts, np.int32)))
            else:
                if mesh is None:
                    batch = sampler.gather_unrolls(train_data, starts,
                                                   flags.unroll_length)
                else:
                    from pvr_habitat_tpu.parallel import mesh as pmesh

                    batch = pmesh.shard_batch(
                        mesh, sampler.gather_unrolls_host(
                            train_data, starts, flags.unroll_length))
                state, metrics = step_fn(state, batch)
            frames += frames_per_epoch
            timer.tick()
        # The just-trained (last) epoch and its start-frame count — what
        # the reference's per-epoch loop logs at eval points.
        epoch = frames // frames_per_epoch - 1
        frames_log = frames - frames_per_epoch

        if (epoch + 1) % flags.eval_frequency == 0:
            if (flags.essential_save_only and stats_util.is_essential_save(
                    epoch, max_epochs, flags.eval_frequency)) or \
                    not flags.essential_save_only:
                stats_ep = _evaluate(make_runner(), eval_envs,
                                     stat_keys, flags.n_episodes_test,
                                     embedding_model if eval_batched_embed
                                     else None, cache=eval_cache)
                stats_util.append_eval(stats, to_env, stats_ep, stat_keys)
                for k in stat_keys:
                    print("  ", k, np.mean(stats_ep[k]))
            else:
                stats_util.append_nan_eval(stats, to_env, stat_keys)

            loss = float(metrics["loss"])
            gnorm = float(metrics["gradient_norm"])
            stats[to_env]["frames"].append(frames_log)
            stats[to_env]["training_loss"].append(loss)
            stats[to_env]["gradient_norm"].append(gnorm)
            print("   frames", frames_log)
            print("   training loss", loss)
            print("   gradient norm", gnorm)

            if not flags.disable_save:
                stats_util.save_stats(save_path + ".pickle", stats)
                ckpt.save_checkpoint(
                    save_path + ".tar",
                    actor_params=state.params,
                    actor_batch_stats=state.batch_stats,
                    opt_state=state.opt_state,
                    flags=flags,
                    embedding_state=embedding_state_host)

    profile_ctx.__exit__(None, None, None)
    env.close()
    for e in eval_envs:
        if e is not env:
            e.close()
    return stats
