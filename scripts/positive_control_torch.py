"""Positive control: a reference-faithful TORCH BC trainer on the same
FakeNav pickles, compared against train/bc.py.

Why (VERDICT r2): single-encoder BC on FakeNav plateaus at ~15-24%
success while the expert solves 90%.  docs/DESIGN.md attributes this to
classic BC compounding error; this script isolates trainer/eval bugs by
training the tests/torch_ref TorchPolicy with a loop that mirrors the
reference exactly (reference main_bc_2.py:186-227: sample_with_minimum_
distance batches, np.mod wraparound gather, NLL loss, LambdaLR stepped
BEFORE the optimizer, manual pre-clip grad norm, clip(40), RMSprop
alpha .99/eps 1e-5) and evaluating it online through OUR env stack +
encoder with a torch policy adapter.  If both implementations land at
the same loss and success, the ceiling is task-intrinsic, not a bug.

Usage (shares a workdir with scripts/validate_learning.py so both
trainers consume the identical embedded pickle):

  python scripts/validate_learning.py  --workdir /tmp/pc --env FakePointNav-room_0 \
      --n_trajectories 1000 --epochs 600 --eval_frequency 150
  python scripts/positive_control_torch.py --workdir /tmp/pc \
      --env FakePointNav-room_0 --epochs 600 --eval_frequency 150
"""

import argparse
import copy
import os
import pickle
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn.functional as F

from pvr_habitat_tpu.data import formats, sampler
from pvr_habitat_tpu.envs.environment import make_environment
from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
from pvr_habitat_tpu.train.evaluate import test
from pvr_habitat_tpu.utils.flags import default_flags
from tests.torch_ref.policy import TorchPolicy


class TorchRunner:
    """Greedy eval adapter satisfying the PolicyRunner calling contract
    (model(env_output, core_state) -> (dict(action=...), new_state)) so
    the torch policy runs through the SAME online eval protocol
    (train/evaluate.test, reference src/test_model.py:4-22)."""

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


def train_torch_bc(data, flags, eval_envs, epochs, eval_frequency,
                   n_episodes_test):
    """The reference training loop (main_bc_2.py:151-227) in torch."""
    obs = np.asarray(data["obs"], np.float32)
    action = np.asarray(data["action"], np.int64)
    n_samples = obs.shape[0]
    obs_size = obs.shape[1]
    num_actions = int(action.max()) + 1

    torch.manual_seed(flags.run_id)
    model = TorchPolicy(obs_size, num_actions,
                        batch_norm=flags.batch_norm)
    model.train()
    opt = torch.optim.RMSprop(
        model.parameters(), lr=flags.learning_rate,
        momentum=flags.momentum, eps=flags.epsilon, alpha=flags.alpha)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda epoch: max(1 - epoch / (epochs + 1), 0.0))

    history = dict(frames=[], training_loss=[], gradient_norm=[],
                   episode_success=[], episode_return=[])
    t, b = flags.unroll_length, flags.batch_size
    for epoch in range(epochs):
        starts = sampler.sample_with_minimum_distance(
            n=n_samples, k=b, d=t)
        idx = np.mod(np.asarray(starts)[:, None] + np.arange(t)[None, :],
                     n_samples)                        # (B, T) wraparound
        batch_obs = torch.from_numpy(obs[idx].transpose(1, 0, 2))
        batch_act = torch.from_numpy(action[idx].T)    # (T, B)
        batch_done = torch.from_numpy(
            np.asarray(data["done"], bool)[idx].T)

        logits, _, _ = model(batch_obs, batch_done,
                             model.initial_state(b))
        loss = F.nll_loss(F.log_softmax(logits.flatten(0, 1), dim=-1),
                          batch_act.flatten())
        sched.step()             # reference quirk: scheduler BEFORE step
        opt.zero_grad()
        loss.backward()
        gnorm = sum(float(p.grad.detach().norm(2)) ** 2
                    for p in model.parameters()
                    if p.grad is not None) ** 0.5
        torch.nn.utils.clip_grad_norm_(model.parameters(),
                                       flags.max_grad_norm)
        opt.step()

        if (epoch + 1) % eval_frequency == 0:
            model.eval()
            runner = TorchRunner(model)
            stats = test(runner, eval_envs[0],
                         ["episode_return", "episode_success"],
                         n_episodes_test)
            model.train()
            history["frames"].append((epoch + 1) * t * b)
            history["training_loss"].append(float(loss))
            history["gradient_norm"].append(gnorm)
            history["episode_success"].append(
                float(np.mean(stats["episode_success"])))
            history["episode_return"].append(
                float(np.mean(stats["episode_return"])))
            print(f"epoch {epoch + 1} loss {float(loss):.4f} "
                  f"gnorm {gnorm:.3f} "
                  f"success {history['episode_success'][-1]:.2f} "
                  f"return {history['episode_return'][-1]:.2f}",
                  flush=True)
    return model, history


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, required=True,
                        help="validate_learning.py workdir (reuses its "
                             "raw + embedded pickles).")
    parser.add_argument("--env", type=str, default="FakePointNav-room_0")
    parser.add_argument("--epochs", type=int, default=600)
    parser.add_argument("--eval_frequency", type=int, default=150)
    parser.add_argument("--n_episodes_test", type=int, default=20)
    parser.add_argument("--final_episodes", type=int, default=0,
                        help="Extra high-episode eval of the final model "
                             "(se at 200 episodes ~±0.02 vs ±0.07 at 20) "
                             "recorded as history['final_success_big'].")
    parser.add_argument("--save_model", type=str, default="",
                        help="torch.save the final state_dict here so the "
                             "model can be re-evaluated offline.")
    parser.add_argument("--out", type=str, default="",
                        help="Write the torch history pickle here.")
    args = parser.parse_args()

    from pvr_habitat_tpu.utils.platform import configure_platform

    configure_platform()  # honor PVR_TPU_PLATFORM before backend init

    flags = default_flags(
        env=args.env, to_env=args.env, data_path=args.workdir,
        embedding_name="random", batch_size=32, unroll_length=100,
        learning_rate=1e-3, batch_norm=True,
        max_episode_steps=100)

    data = formats.load_pickle(
        formats.embedded_path(args.workdir, args.env, "random"))

    # Same seeding as train/bc.py run() (reference main_bc_2.py:28-31).
    np.random.seed(flags.run_id)
    random.seed(flags.run_id)

    # Eval env: our stack + the SAME persisted random encoder the jax
    # trainer evaluates with (random_1.tar in the workdir).
    embedding = EmbeddingNet(
        "random", in_channels=3, pretrained=True, train=False,
        checkpoint_dir=args.workdir, run_id=flags.run_id)
    env_flags = copy.copy(flags)
    env = make_environment(env_flags, embedding)

    t0 = time.time()
    model, history = train_torch_bc(
        data, flags, [env], args.epochs, args.eval_frequency,
        args.n_episodes_test)
    print("torch control total %.0fs" % (time.time() - t0), flush=True)

    if args.save_model:
        torch.save(model.state_dict(), args.save_model)
    if args.final_episodes:
        model.eval()
        stats = test(TorchRunner(model), env,
                     ["episode_return", "episode_success"],
                     args.final_episodes)
        history["final_success_big"] = float(
            np.mean(stats["episode_success"]))
        history["final_episodes"] = args.final_episodes
        print(f"final {args.final_episodes}-episode success "
              f"{history['final_success_big']:.3f} return "
              f"{float(np.mean(stats['episode_return'])):.2f}", flush=True)
    env.close()

    if args.out:
        with open(args.out, "wb") as handle:
            pickle.dump(history, handle)

    # Side-by-side with the jax trainer if validate_learning ran here.
    jax_stats_path = os.path.join(
        args.workdir, "bc",
        f"{args.env}_emrandom_s1_{args.env}.pickle")
    if os.path.isfile(jax_stats_path):
        with open(jax_stats_path, "rb") as handle:
            jax_stats = pickle.load(handle)[args.env]
        print("jax   success:",
              [round(v, 2) for v in jax_stats["episode_success"]])
        print("torch success:",
              [round(v, 2) for v in history["episode_success"]])
        print("jax   loss:",
              [round(float(v), 3) for v in jax_stats["training_loss"]])
        print("torch loss:",
              [round(v, 3) for v in history["training_loss"]])


if __name__ == "__main__":
    main()
