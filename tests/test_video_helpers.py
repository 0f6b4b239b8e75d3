"""Video capture helper behavior (reference demo_helpers/video.py:220-225).

cv2 in this image can't author rotation-metadata videos (VideoWriter has no
orientation tag support), so the orientation fix is pinned at the flag level:
captures created through the helper must have CAP_PROP_ORIENTATION_AUTO
enabled, which is what makes phone-shot portrait videos decode upright
(opencv/opencv#26795)."""

import os.path as osp

import cv2
import numpy as np
import pytest

from muggled_dpt_tpu.demo_helpers.video import LoopingVideoReader, create_video_capture


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    d = tmp_path_factory.mktemp("vid")
    path = str(d / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    assert vw.isOpened()
    for i in range(5):
        vw.write(np.full((48, 64, 3), i * 10, np.uint8))
    vw.release()
    return path


def test_capture_opts_into_rotation_metadata(tiny_video):
    cap = create_video_capture(tiny_video)
    try:
        assert cap.get(cv2.CAP_PROP_ORIENTATION_AUTO) == 1.0
    finally:
        cap.release()


def test_looping_reader_uses_orientation_fix(tiny_video):
    reader = LoopingVideoReader(tiny_video)
    try:
        assert reader._cap.get(cv2.CAP_PROP_ORIENTATION_AUTO) == 1.0
        _, idx, frame = next(reader)
        assert idx == 0 and frame.shape == (48, 64, 3)
    finally:
        reader.release()


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        create_video_capture(osp.join("definitely", "missing.mp4"))
