"""PNG/JPEG dataset layouts (SURVEY §2.2 contracts) and the native C++
image codec vs. the cv2 oracle."""

import os
import pickle

import numpy as np
import pytest

from pvr_habitat_tpu.data import formats, native


def _fake_traj(t_len=5, seed=0, channels=6):
    rng = np.random.RandomState(seed)
    obs = [rng.randint(0, 256, (64, 64, channels), np.uint8)
           for _ in range(t_len)]
    action = rng.randint(0, 3, t_len)
    reward = rng.rand(t_len).astype(np.float32)
    done = np.zeros(t_len, bool)
    done[-1] = True
    true_state = rng.randn(t_len, 12).astype(np.float32)
    return obs, action, reward, done, true_state


def test_native_codec_builds_and_matches_cv2(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    paths = []
    for i in range(4):
        img = rng.randint(0, 256, (64, 64, 3), np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    assert native.available(), "native codec failed to build"
    got = native.decode_batch(paths, 64, 64, kind="png", bgr=True)
    for i, p in enumerate(paths):
        want = cv2.imread(p)
        np.testing.assert_array_equal(got[i], want)


def test_native_jpeg_decode(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    p = str(tmp_path / "img_0.jpeg")
    Image.fromarray(img).save(p)
    got = native.decode_batch([p], 64, 64, kind="jpeg", bgr=False)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got[0], want)


def test_native_count_frames(tmp_path):
    import cv2

    img = np.zeros((64, 64, 3), np.uint8)
    for i in range(7):
        cv2.imwrite(str(tmp_path / f"3_{i}.png"), img)
    assert native.count_frames(str(tmp_path), 3, "png", 500) == 7
    assert native.count_frames(str(tmp_path), 9, "png", 500) == 0


def test_png_trajectory_roundtrip(tmp_path):
    obs, action, reward, done, true_state = _fake_traj(channels=6)
    formats.save_png_trajectory(str(tmp_path), 0, obs, action, reward,
                                done, true_state)
    assert os.path.isfile(tmp_path / "0_0.png")
    assert os.path.isfile(tmp_path / "0_goal.png")
    assert os.path.isfile(tmp_path / "0.pickle")

    data = formats.read_png_trajectories(str(tmp_path))
    assert data["obs"].shape == (5, 64, 64, 6)
    np.testing.assert_array_equal(data["action"], action)
    np.testing.assert_allclose(data["reward"], reward)
    # PNG round-trip through cv2's BGR write/read is lossless
    np.testing.assert_array_equal(data["obs"][0][..., :3], obs[0][..., :3])


def test_png_embed_on_read(tmp_path):
    obs, action, reward, done, true_state = _fake_traj(seed=3, channels=6)
    formats.save_png_trajectory(str(tmp_path), 0, obs, action, reward,
                                done, true_state)

    def embed(frames):  # stand-in encoder: per-frame channel means
        return frames.reshape(frames.shape[0], -1, 3).mean(1)

    data = formats.read_png_trajectories(str(tmp_path), embed_fn=embed)
    assert data["obs"].shape == (5, 6)   # 3 frame dims + 3 goal dims


def test_jpeg_trajectory_layout(tmp_path):
    obs, action, reward, done, true_state = _fake_traj(seed=4, channels=3)
    formats.save_jpeg_trajectory(str(tmp_path), 2, obs, true_state,
                                 frameskip=3)
    assert os.path.isfile(tmp_path / "2_0.jpeg")
    assert os.path.isfile(tmp_path / "2_3.jpeg")
    assert not os.path.isfile(tmp_path / "2_1.jpeg")  # frameskip
    with open(tmp_path / "2.pickle", "rb") as fh:
        pose = pickle.load(fh)
    assert pose.shape == (5, 8)  # position + orientation only


def test_read_png_prefetch_matches_sync(tmp_path):
    """The prefetched (threaded-decode) reader must return exactly the
    synchronous reader's output, and propagate decode errors."""
    for t in range(3):
        obs, action, reward, done, true_state = _fake_traj(channels=6)
        formats.save_png_trajectory(str(tmp_path), t, obs, action,
                                    reward, done, true_state)
    a = formats.read_png_trajectories(str(tmp_path), prefetch=2)
    b = formats.read_png_trajectories(str(tmp_path), prefetch=0)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])

    # decode error from the producer thread surfaces in the consumer
    bad = tmp_path / "1_2.png"
    bad.write_bytes(b"not a png")
    with pytest.raises(Exception):
        formats.read_png_trajectories(str(tmp_path), prefetch=2)
