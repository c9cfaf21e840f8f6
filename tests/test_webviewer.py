"""Live HTTP/MJPEG viewer (webviewer.LiveViewer) — the interactive-GUI
equivalent (ref QtGUI.cpp:84-258): stream serves pushed frames, controls
flip the pause/reset/view flags the SLAM loop polls."""

import json
import urllib.request

import numpy as np
import pytest

from supereight_tpu.webviewer import LiveViewer


@pytest.fixture()
def viewer():
    v = LiveViewer(port=0)          # ephemeral port
    v.start()
    yield v
    v.stop()


def _get(v, path, timeout=5):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{v.port}{path}", timeout=timeout)


def test_page_stats_and_controls(viewer):
    assert b"supereight-tpu" in _get(viewer, "/").read()

    viewer.push(np.zeros((4, 4, 4), np.uint8), stats={"frame": 7})
    st = json.loads(_get(viewer, "/stats").read())
    assert st["frame"] == 7.0

    assert not viewer.paused
    _get(viewer, "/ctl?cmd=pause")
    assert viewer.paused
    _get(viewer, "/ctl?cmd=resume")
    assert not viewer.paused

    assert viewer.view_mode == "follow"
    _get(viewer, "/ctl?cmd=view=static")
    assert viewer.view_mode == "static"

    assert not viewer.reset_pending
    _get(viewer, "/ctl?cmd=reset")
    assert viewer.reset_pending
    assert viewer.take_reset()
    assert not viewer.take_reset()   # one-shot


def test_stream_serves_pushed_jpeg(viewer):
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 0] = 200
    viewer.push(rgba)
    r = _get(viewer, "/stream")
    assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
    # one multipart frame: boundary, jpeg header, payload
    assert r.readline().strip() == b"--se8frame"
    assert b"image/jpeg" in r.readline()
    n = int(r.readline().split(b":")[1])
    r.readline()
    jpeg = r.read(n)
    assert jpeg[:2] == b"\xff\xd8"   # JPEG SOI marker
    from PIL import Image
    import io
    im = Image.open(io.BytesIO(jpeg))
    assert im.size == (8, 8)
    r.close()
