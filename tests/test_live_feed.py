"""Live operator feed (track/live_feed.py) — lmpc.foxglove.json equivalent."""

import json
import urllib.request

import numpy as np
import pytest

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation
from racing_lmpc_tpu.track.live_feed import LiveFeed, attach_live_feed
from racing_lmpc_tpu.track.visualizer import TrajectoryVisualizer
from racing_lmpc_tpu.track.trajectory import RacingTrajectory
from racing_lmpc_tpu.config import TRACK_DIR


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def test_feed_serves_scene_and_viewer():
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    feed = LiveFeed(TrajectoryVisualizer(track))
    port = feed.start()
    try:
        scene = json.loads(_get(port, "/scene"))
        assert len(scene["track"]["center"]) >= 1000
        assert len(scene["track"]["left"]) >= 1000
        feed.update(prediction=np.zeros((5, 2)),
                    telemetry={"solved": True, "solve_time": 0.001})
        scene2 = json.loads(_get(port, "/scene"))
        assert scene2["seq"] > scene["seq"]
        assert scene2["prediction"] == [[0.0, 0.0]] * 5
        assert scene2["telemetry"]["solved"] is True
        html = _get(port, "/").decode()
        assert "EventSource('/stream')" in html
    finally:
        feed.stop()


def test_feed_attached_to_cosim():
    cs = CoSimulation(_SCENARIOS["barc_tracking_mpc"], n_override=10)
    feed, port = attach_live_feed(cs)
    try:
        for _ in range(3):
            cs.step()
        scene = json.loads(_get(port, "/scene"))
        assert "prediction" in scene and len(scene["prediction"]) == 10
        assert "vehicle" in scene and len(scene["vehicle"]) == 4
        assert scene["telemetry"]["solve_time"] >= 0.0
    finally:
        feed.stop()
