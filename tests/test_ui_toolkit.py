"""UI toolkit: rendering shapes, state handling, mouse routing (no display)."""

import numpy as np
import cv2

from muggled_dpt_tpu.demo_helpers import ui


def test_slider_set_read_and_drag():
    s = ui.Slider("x", 5, 0, 10, step=1)
    changed, v = s.read()
    assert not changed and v == 5
    s.set(7, flag_change=True)
    changed, v = s.read()
    assert changed and v == 7
    img = s.render(300)
    assert img.shape == (s.height, 300, 3)
    # drag to the far right
    s.on_mouse(295, 10, cv2.EVENT_LBUTTONDOWN)
    changed, v = s.read()
    assert changed and v == 10


def test_toggle_and_buttonbar():
    t = ui.ToggleButton("t", False)
    t.on_mouse(5, 5, cv2.EVENT_LBUTTONDOWN)
    assert t.is_on
    bar = ui.ButtonBar(["a", "b", "c"])
    bar.render(300)
    bar.on_mouse(250, 5, cv2.EVENT_LBUTTONDOWN)
    assert bar.read() == "c"
    assert bar.read() is None


def test_colormaps_apply_all():
    c = ui.ColormapsBar()
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    for _ in range(6):
        out = c.apply(img)
        assert out.shape == (16, 16, 3)
        c.next()
    assert c.render(300).shape[1] == 300


def test_spectral_colormap_shape():
    lut = ui.make_spectral_colormap()
    assert lut.shape == (256, 1, 3) and lut.dtype == np.uint8
    # endpoints: dark blue-ish -> dark red-ish (BGR order)
    assert lut[0, 0, 0] > lut[0, 0, 2]  # blue-dominant start
    assert lut[255, 0, 2] > lut[255, 0, 0]  # red-dominant end


def test_stacks_render_and_route():
    s = ui.Slider("x", 0, 0, 10)
    t = ui.ToggleButton("t")
    img_panel = ui.ImageDisplay(np.zeros((40, 80, 3), np.uint8))
    v = ui.VStack(img_panel, ui.HStack(s, t), None)
    frame = v.render(200)
    assert frame.shape[1] == 200
    # click into the toggle half of the hstack row
    y_hstack = img_panel.height + 5
    v.on_mouse(150, y_hstack, cv2.EVENT_LBUTTONDOWN)
    assert t.is_on


def test_prewarm_returns_unique_sizes():
    import jax.numpy as jnp
    from muggled_dpt_tpu.make_depthanythingv2_dpt import make_depthanythingv2_dpt

    m = make_depthanythingv2_dpt(64, 1, 4, (8, 16, 32, 64), (8, 8), 16, dtype=jnp.float32)
    warmed = m.prewarm([56, 56, 84], image_hw=(120, 160))
    assert warmed == [(56, 56), (84, 84)]
