"""Live web viewer (Viewer/FrameDrawer observability equivalent)."""

import urllib.request

import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker
from orb_slam2_ssd_semantic_tpu.apps.web_viewer import LiveViewer


def test_viewer_serves_dashboard_and_images():
    tr = Tracker(SlamConfig())
    viewer = LiveViewer(tr, port=8689)
    viewer.start()
    try:
        viewer.publish_frame(np.zeros((480, 640), np.float32))
        page = urllib.request.urlopen(
            "http://127.0.0.1:8689/", timeout=10).read()
        assert b"live viewer" in page
        png = urllib.request.urlopen(
            "http://127.0.0.1:8689/frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        mp = urllib.request.urlopen(
            "http://127.0.0.1:8689/map.png", timeout=10).read()
        assert mp[:8] == b"\x89PNG\r\n\x1a\n"
        stats = urllib.request.urlopen(
            "http://127.0.0.1:8689/stats", timeout=10).read()
        assert b"stage" in stats
    finally:
        viewer.stop()
