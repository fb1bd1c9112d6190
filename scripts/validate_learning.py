"""End-to-end learning validation on the hermetic FakeNav simulator.

Generates 5000 expert trajectories, embeds them with the 'random'
encoder, trains BC (lr 1e-3 + batch_norm for speed; the reference's
1e-4 works with more budget), and evaluates online.  Expected: episode success
rises 0 -> ~0.16 -> ~0.24 over ~2000 epochs with mean return above the
expert demonstrator's (TPU: ~25 min datagen on one CPU core + minutes
of training).

Demonstrates the whole pipeline learns: expert data -> encoder ->
BC -> online navigation.  (The true_state variant exhibits the classic
BC latching pathology — the LSTM shortcuts to action repetition — which
pixel observations avoid; see memory notes.)
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, tempfile, time
from pvr_habitat_tpu.utils.flags import default_flags
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.tools.save_embedded_obs import run as embed_run
from pvr_habitat_tpu.train.bc import run as bc_run

tmp = tempfile.mkdtemp(); ENV="FakePointNav-room_0"
flags = default_flags(env=ENV, save_path=tmp, max_episode_steps=100)
flags.n_trajectories = 5000
t0=time.time(); gen_data_habitat(flags); print("datagen %.0fs" % (time.time()-t0), flush=True)

eflags = default_flags(env=ENV, data_path=tmp, embedding_name="random", batch_size=256)
eflags.n_trajectories = -1; eflags.source = "pickle"
t0=time.time(); embed_run(eflags); print("embed %.0fs" % (time.time()-t0), flush=True)

bc = default_flags(env=ENV, to_env=ENV, data_path=tmp, save_path=os.path.join(tmp,"bc"),
                   embedding_name="random", batch_size=32, unroll_length=100,
                   learning_rate=1e-3, batch_norm=True,
                   max_frames=32*100*3000, eval_frequency=750, n_episodes_test=20,
                   max_episode_steps=100, eval_batch=5, disable_save=True)
t0=time.time()
stats = bc_run(bc, mode="precomputed")
s = stats[ENV]
print("total %.0fs" % (time.time()-t0), flush=True)
print("success:", [round(v,2) for v in s["episode_success"]], flush=True)
print("return:", [round(v,2) for v in s["episode_return"]], flush=True)
print("loss:", [round(float(v),3) for v in s["training_loss"]], flush=True)
