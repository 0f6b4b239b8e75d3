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


def test_image_display_hover_and_marker():
    d = ui.ImageDisplay(np.zeros((100, 200, 3), np.uint8))
    marker = d.add_marker((0.5, 0.5))
    d.set_hover_text(lambda xy: f"{xy[0]:.2f}")
    d.render(400)  # establishes render size (400, 200)
    # grab the marker and drag it
    d.on_mouse(200, 100, cv2.EVENT_LBUTTONDOWN)
    d.on_mouse(300, 50, cv2.EVENT_MOUSEMOVE)
    d.on_mouse(300, 50, cv2.EVENT_LBUTTONUP)
    changed, xy = marker.read()
    assert changed and abs(xy[0] - 0.75) < 0.01 and abs(xy[1] - 0.25) < 0.01
    # click far away from the single marker -> click-to-place
    d.on_mouse(40, 20, cv2.EVENT_LBUTTONDOWN)
    changed, xy = marker.read()
    assert changed and abs(xy[0] - 0.1) < 0.01
    # hover tooltip renders without error; elsewhere clears hover
    assert d.render(400).shape == (200, 400, 3)
    d.on_mouse_elsewhere()
    assert d.hover_xy_norm is None


def test_line_plot_render_and_hover():
    p = ui.LinePlot("stat").set_series([1.0, 5.0, 3.0, 8.0, 2.0], highlight_idx=3)
    assert p.render(400).shape == (110, 400, 3)
    p.on_mouse(200, 50, cv2.EVENT_MOUSEMOVE)
    assert p._hover_idx is not None
    p.render(400)
    p.on_mouse_elsewhere()
    assert p._hover_idx is None
    # empty series renders a blank bar
    assert ui.LinePlot().render(300).shape == (110, 300, 3)


def test_playback_bar_controls():
    pb = ui.PlaybackBar(100)
    pb.render(500)
    # left zone toggles pause
    pb.on_mouse(10, 10, cv2.EVENT_LBUTTONDOWN)
    changed, paused = pb.read_pause()
    assert changed and paused and pb.is_paused
    # scrubbing the track emits a seek
    pb.on_mouse(300, 10, cv2.EVENT_LBUTTONDOWN)
    pb.on_mouse(350, 10, cv2.EVENT_MOUSEMOVE)
    pb.on_mouse(350, 10, cv2.EVENT_LBUTTONUP)
    changed, seek = pb.read_seek()
    assert changed and 0 <= seek < 100
    # set_frame clamps and shows in the counter render
    pb.set_frame(500)
    assert pb._frame == 99
    pb.render(500)
