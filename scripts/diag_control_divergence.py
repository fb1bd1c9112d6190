"""Root-cause diagnostics for the round-3 positive-control divergence.

The torch control (scripts/positive_control_torch.py, reference-loop
faithful except weight init) finished at teacher-forced loss 0.274 but
0.5% online success (1/200), while the jax trainer on the same data
reached loss 0.301 and 9.0% +- 2.0% (18/200) — VERDICT r3 item 2.

This script localizes the gap with four cheap CPU measurements over the
two ALREADY-TRAINED artifacts (/root/study_pc/torch_final.pt and the
jax checkpoint .tar):

1. teacher-forced argmax accuracy on the TRAINING data (both models) —
   separates "torch model broken offline" from "online-only gap";
2. teacher-forced accuracy on FRESH held-out expert trajectories —
   separates memorization (fit gap) from an eval-path bug;
3. lockstep counterfactual rollouts: drive episodes with policy A while
   recording what policy B would have done on the identical observation
   stream (and vice versa) — measures on-policy action agreement and
   where the trajectories first diverge;
4. online success + action/episode-length histograms for both models
   through the SAME train/evaluate.test protocol used by both controls.

Usage:
  PVR_TPU_PLATFORM=cpu python scripts/diag_control_divergence.py \
      --workdir /root/study_pc --episodes 50
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.utils.platform import configure_platform

configure_platform()  # honor PVR_TPU_PLATFORM before jax backend init

import torch  # noqa: E402

from pvr_habitat_tpu.data import formats  # noqa: E402
from pvr_habitat_tpu.envs.environment import make_environment  # noqa: E402
from pvr_habitat_tpu.models.embedding_net import EmbeddingNet  # noqa: E402
from pvr_habitat_tpu.tools.save_opt_trajectories import (  # noqa: E402
    gen_data_habitat)
from pvr_habitat_tpu.train.evaluate import PolicyRunner, test  # noqa: E402
from pvr_habitat_tpu.utils import checkpoint as ckpt  # noqa: E402
from pvr_habitat_tpu.utils.flags import default_flags  # noqa: E402
from tests.torch_ref.policy import TorchPolicy  # noqa: E402


class TorchRunner:
    """Same greedy adapter as positive_control_torch.TorchRunner."""

    def __init__(self, model):
        self.model = model

    def initial_state(self, batch_size=1):
        return self.model.initial_state(batch_size)

    def __call__(self, env_output, core_state):
        obs = torch.from_numpy(np.asarray(env_output["obs"], np.float32))
        done = torch.from_numpy(np.asarray(env_output["done"]))
        with torch.no_grad():
            logits, _, new_state = self.model(obs, done, core_state)
        action = torch.argmax(logits.flatten(0, 1), dim=-1)
        return dict(action=action.numpy().reshape(1, 1)), new_state


def teacher_forced_acc_torch(model, obs, act, done, n=6400, t=100):
    correct = tot = 0
    with torch.no_grad():
        for s in range(0, min(n, len(obs) - t), t):
            o = torch.from_numpy(obs[s:s + t]).unsqueeze(1)
            d = torch.from_numpy(done[s:s + t]).unsqueeze(1)
            logits, _, _ = model(o, d, model.initial_state(1))
            pred = logits.squeeze(1).argmax(-1).numpy()
            correct += int((pred == act[s:s + t]).sum())
            tot += t
    return correct / tot


def teacher_forced_acc_jax(runner, obs, act, done, n=6400, t=100):
    import jax.numpy as jnp

    from pvr_habitat_tpu.models import policy as policy_mod

    correct = tot = 0
    for s in range(0, min(n, len(obs) - t), t):
        inputs = dict(obs=jnp.asarray(obs[s:s + t][:, None]),
                      done=jnp.asarray(done[s:s + t][:, None]))
        outputs, _, _ = policy_mod.apply_policy(
            runner.params, runner.batch_stats, inputs,
            policy_mod.initial_state(1), batch_norm=True, train=False)
        pred = np.asarray(outputs["action"]).reshape(-1)
        correct += int((pred == act[s:s + t]).sum())
        tot += t
    return correct / tot


def lockstep(driver, passenger, env, episodes):
    """Roll episodes with `driver`; record `passenger`'s counterfactual
    action per step.  Returns (success_rate, agreement, first_divergence
    step stats, driver action histogram, mean episode length)."""
    env_output = env.initial()
    ds = driver.initial_state(1)
    ps = passenger.initial_state(1)
    succ, agree, tot, lens, first_div = [], 0, 0, [], []
    actions_hist = np.zeros(8, np.int64)
    for _ in range(episodes):
        steps, div_at = 0, None
        while True:
            d_out, ds = driver(env_output, ds)
            p_out, ps = passenger(env_output, ps)
            da = int(np.asarray(d_out["action"]).reshape(()))
            pa = int(np.asarray(p_out["action"]).reshape(()))
            agree += int(da == pa)
            tot += 1
            if da != pa and div_at is None:
                div_at = steps
            actions_hist[da] += 1
            env_output = env.step(d_out["action"])
            steps += 1
            if env_output["done"]:
                break
        succ.append(float(np.asarray(env_output["episode_success"])[0][0]))
        lens.append(steps)
        first_div.append(steps if div_at is None else div_at)
    return dict(success=float(np.mean(succ)),
                agreement=agree / max(tot, 1),
                mean_len=float(np.mean(lens)),
                median_first_divergence=float(np.median(first_div)),
                action_hist=actions_hist[:4].tolist())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/root/study_pc")
    parser.add_argument("--env", type=str, default="FakePointNav-room_0")
    parser.add_argument("--episodes", type=int, default=50)
    parser.add_argument("--heldout_trajs", type=int, default=100)
    args = parser.parse_args()

    data = formats.load_pickle(
        formats.embedded_path(args.workdir, args.env, "random"))
    obs = np.asarray(data["obs"], np.float32)
    act = np.asarray(data["action"], np.int64)
    done = np.asarray(data["done"], bool)
    num_actions = int(act.max()) + 1

    tmodel = TorchPolicy(obs.shape[1], num_actions, batch_norm=True)
    tmodel.load_state_dict(
        torch.load(os.path.join(args.workdir, "torch_final.pt"),
                   map_location="cpu"))
    tmodel.eval()

    jpath = os.path.join(
        args.workdir, "bc", f"{args.env}_emrandom_s1_{args.env}.tar")
    payload = ckpt.load_checkpoint(jpath)
    params, stats = ckpt.split_actor_state(
        payload["actor_model_state_dict"])
    jrunner = PolicyRunner(params, stats, batch_norm=True)
    trunner = TorchRunner(tmodel)

    print("== 1. teacher-forced accuracy, TRAINING data ==", flush=True)
    print("  torch:", round(teacher_forced_acc_torch(
        tmodel, obs, act, done), 4), flush=True)
    print("  jax:  ", round(teacher_forced_acc_jax(
        jrunner, obs, act, done), 4), flush=True)

    print("== 2. teacher-forced accuracy, HELD-OUT expert data ==",
          flush=True)
    hdir = os.path.join(args.workdir, "heldout")
    raw = formats.raw_path(hdir, args.env)
    if not os.path.isfile(raw):
        gflags = default_flags(env=args.env, save_path=hdir,
                               max_episode_steps=100, run_id=77)
        gflags.n_trajectories = args.heldout_trajs
        gen_data_habitat(gflags)
    hdata = formats.read_habitat_data(raw)
    embedding = EmbeddingNet("random", in_channels=3, pretrained=True,
                             train=False, checkpoint_dir=args.workdir,
                             run_id=1)
    hframes = np.asarray(hdata["obs"], np.uint8)
    hembs = []
    for s in range(0, len(hframes), 256):
        hembs.append(np.asarray(embedding(hframes[s:s + 256])))
    hobs = np.concatenate(hembs).astype(np.float32)
    hact = np.asarray(hdata["action"], np.int64)
    hdone = np.asarray(hdata["done"], bool)
    print("  torch:", round(teacher_forced_acc_torch(
        tmodel, hobs, hact, hdone, n=len(hobs)), 4), flush=True)
    print("  jax:  ", round(teacher_forced_acc_jax(
        jrunner, hobs, hact, hdone, n=len(hobs)), 4), flush=True)

    flags = default_flags(
        env=args.env, to_env=args.env, data_path=args.workdir,
        embedding_name="random", batch_norm=True, max_episode_steps=100)
    env = make_environment(flags, embedding)

    print("== 3. lockstep counterfactual rollouts ==", flush=True)
    print("  driver=jax:  ", lockstep(jrunner, trunner, env,
                                      args.episodes), flush=True)
    print("  driver=torch:", lockstep(trunner, jrunner, env,
                                      args.episodes), flush=True)

    print("== 4. online success via test() ==", flush=True)
    for name, runner in (("jax", jrunner), ("torch", trunner)):
        s = test(runner, env, ["episode_return", "episode_success",
                               "episode_step"], args.episodes)
        print(f"  {name}: success {np.mean(s['episode_success']):.3f} "
              f"return {np.mean(s['episode_return']):.2f} "
              f"steps {np.mean(s['episode_step']):.1f}", flush=True)
    env.close()


if __name__ == "__main__":
    main()
