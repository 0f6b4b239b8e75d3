"""Round-3b UI additions: layout family (grid/swapper/overlay-stack/
separators/padding/weighted HStack), radio/immediate buttons, multi-handle
slider, text blocks, histogram plot, and the editable crop-box / mouse-paint
/ hover-label overlays (reference toadui/layout.py, buttons.py, sliders.py,
text.py, plots.py, overlays.py).

Headless: renders to numpy frames and simulates cv2 mouse events through the
same on_mouse entry points DisplayWindow uses.
"""

import cv2
import numpy as np

from muggled_dpt_tpu.demo_helpers.ui import (
    EditBoxOverlay,
    GridStack,
    HistogramPlot,
    HoverLabelOverlay,
    HSeparator,
    HStack,
    ImageDisplay,
    ImmediateButton,
    MessageBar,
    MousePaintOverlay,
    MultiSlider,
    OverlayStack,
    Padded,
    RadioBar,
    Slider,
    Swapper,
    TextBlock,
    ToggleButton,
    VSeparator,
)


def _display(w=200, h=100):
    d = ImageDisplay(np.zeros((h, w, 3), np.uint8))
    d.render(w)
    return d


# ---------------------------------------------------------------------------
# buttons / sliders / text / plots


def test_immediate_button_pops_click_once():
    b = ImmediateButton("save")
    b.render(120)
    assert b.read() is False
    b.on_mouse(60, 17, cv2.EVENT_LBUTTONDOWN)
    assert b.read() is True
    assert b.read() is False  # popped
    assert b.render(120).any()


def test_radio_bar_exclusive_selection():
    r = RadioBar(["a", "b", "c"], default_index=1)
    r.render(300)
    assert (r.index, r.value) == (1, "b")
    r.on_mouse(250, 17, cv2.EVENT_LBUTTONDOWN)  # rightmost third
    changed, idx, label = r.read()
    assert changed and idx == 2 and label == "c"
    r.on_mouse(250, 17, cv2.EVENT_LBUTTONDOWN)  # same option: no change
    changed, _, _ = r.read()
    assert not changed
    r.select("a")
    assert r.read() == (True, 0, "a")


def test_multislider_handles_drag_and_cannot_cross():
    ms = MultiSlider("range", (20, 80), 0, 100, step=1)
    ms.render(320)
    assert ms.values == (20, 80)
    # grab the low handle (near its x) and drag right past the high handle
    x_low = ms._to_x(20, 320)
    ms.on_mouse(x_low, 18, cv2.EVENT_LBUTTONDOWN)
    assert ms.wants_mouse()
    ms.on_mouse(310, 18, cv2.EVENT_MOUSEMOVE)
    ms.on_mouse(310, 18, cv2.EVENT_LBUTTONUP)
    changed, values = ms.read()
    assert changed
    assert values[0] <= values[1], "handles must not cross"
    assert values[0] == 80  # clamped at the other handle


def _has_ink(frame):
    """Any pixel differing from the flat bar background."""
    return bool((frame != frame[0, 0]).any())


def test_textblock_and_messagebar():
    tb = TextBlock(["line one", "line two"], prefix="* ")
    frame = tb.render(260)
    assert frame.shape[0] == tb.height and _has_ink(frame)
    tb.set("single")
    assert tb.render(260).shape[0] == tb.height

    mb = MessageBar(show_for=2)
    assert not _has_ink(mb.render(200))
    mb.set("saved!")
    assert _has_ink(mb.render(200))
    assert _has_ink(mb.render(200))
    mb.render(200)
    assert not _has_ink(mb.render(200)), "message should expire after show_for renders"


def test_histogram_plot_render_and_hover():
    hp = HistogramPlot("hist")
    assert not _has_ink(hp.render(300)[20:])  # empty: no bars
    hp.set_data(np.concatenate([np.zeros(50), np.ones(10)]), bins=4, value_range=(0, 1))
    frame = hp.render(300)
    assert _has_ink(frame[20:])
    hp.on_mouse(20, 50, cv2.EVENT_MOUSEMOVE)
    assert hp._hover_idx == 0
    hp.on_mouse_elsewhere()
    assert hp._hover_idx is None


# ---------------------------------------------------------------------------
# layout family


def test_weighted_hstack_and_separators():
    s1, s2 = Slider("a", 5, 0, 10), Slider("b", 5, 0, 10)
    row = HStack(s1, VSeparator(), s2, weights=(1, 0.05, 1))
    frame = row.render(410)
    assert frame.shape[1] == 410
    # the separator band is narrow: clicking at 3/4 width hits the second slider
    row.on_mouse(380, 18, cv2.EVENT_LBUTTONDOWN)
    row.on_mouse(380, 18, cv2.EVENT_LBUTTONUP)
    assert s2.read()[0] and not s1.read()[0]
    assert HSeparator().render(200).shape[0] == HSeparator().height


def test_padded_offsets_mouse_into_child():
    s = Slider("a", 0, 0, 10)
    p = Padded(s, pad=10)
    frame = p.render(320)
    assert frame.shape[1] == 320
    # click at the padded track's right end -> slider max
    p.on_mouse(310, 25, cv2.EVENT_LBUTTONDOWN)
    p.on_mouse(310, 25, cv2.EVENT_LBUTTONUP)
    changed, value = s.read()
    assert changed and value == 10
    assert not p.wants_mouse()


def test_gridstack_routes_to_cells():
    buttons = [ToggleButton(f"b{i}") for i in range(4)]
    grid = GridStack(*buttons, num_cols=2)
    frame = grid.render(200)
    assert frame.shape[0] == grid.height
    # click bottom-right cell
    grid.on_mouse(150, grid.height - 10, cv2.EVENT_LBUTTONDOWN)
    assert buttons[3].read() == (True, True)
    assert all(not b.read()[0] for b in buttons[:3])


def test_swapper_renders_and_routes_only_active():
    a, b = ToggleButton("a"), ToggleButton("b")
    sw = Swapper(a, b)
    sw.render(150)
    sw.on_mouse(75, 17, cv2.EVENT_LBUTTONDOWN)
    assert a.read() == (True, True) and not b.read()[0]
    sw.cycle()
    changed, idx = sw.read()
    assert changed and idx == 1
    sw.render(150)
    sw.on_mouse(75, 17, cv2.EVENT_LBUTTONDOWN)
    assert b.read() == (True, True) and not a.read()[0]


def test_overlay_stack_lifts_overlays_onto_any_element():
    tb = TextBlock("")
    seen = []
    stack = OverlayStack(tb, HoverLabelOverlay(lambda xy: seen.append(xy) or f"{xy[0]:.1f}"))
    base = tb.render(200).copy()
    stack.render(200)
    stack.on_mouse(100, tb.height // 2, cv2.EVENT_MOUSEMOVE)
    frame = stack.render(200)
    assert seen and abs(seen[-1][0] - 0.5) < 0.05, "overlay got normalized coords"
    assert (frame != base).any(), "tooltip drew over the base render"
    stack.on_mouse_elsewhere()
    assert (stack.render(200) == base).all()


# ---------------------------------------------------------------------------
# overlays: crop box + painting


def test_editbox_starts_fullframe_and_resizes_by_corner():
    d = _display(200, 100)
    box = d.add_overlay(EditBoxOverlay())
    changed, (tl, br) = box.read()
    assert changed and tl == (0.0, 0.0) and br == (1.0, 1.0)
    # drag the top-left corner handle to (0.25, 0.25)
    d.on_mouse(0, 0, cv2.EVENT_LBUTTONDOWN)
    assert box.wants_mouse()
    d.on_mouse(50, 25, cv2.EVENT_MOUSEMOVE)
    d.on_mouse(50, 25, cv2.EVENT_LBUTTONUP)
    changed, (tl, br) = box.read()
    assert changed
    assert abs(tl[0] - 0.25) < 0.02 and abs(tl[1] - 0.25) < 0.02
    assert br == (1.0, 1.0)


def test_editbox_move_redraw_and_rightclick_reset():
    box = EditBoxOverlay(box=((0.2, 0.2), (0.4, 0.4)))
    box.read()
    # drag the interior: box translates, size preserved
    box.on_mouse((0.3, 0.3), cv2.EVENT_LBUTTONDOWN)
    box.on_mouse((0.5, 0.5), cv2.EVENT_MOUSEMOVE)
    box.on_mouse((0.5, 0.5), cv2.EVENT_LBUTTONUP)
    _, (tl, br) = box.read()
    assert abs(tl[0] - 0.4) < 1e-6 and abs(br[0] - 0.6) < 1e-6
    assert abs(br[0] - tl[0] - 0.2) < 1e-6 and abs(br[1] - tl[1] - 0.2) < 1e-6
    # click far outside: draws a fresh box from that anchor
    box.on_mouse((0.8, 0.1), cv2.EVENT_LBUTTONDOWN)
    box.on_mouse((0.9, 0.3), cv2.EVENT_MOUSEMOVE)
    box.on_mouse((0.9, 0.3), cv2.EVENT_LBUTTONUP)
    _, (tl, br) = box.read()
    assert abs(tl[0] - 0.8) < 1e-6 and abs(br[0] - 0.9) < 1e-6
    # corner crossing swaps roles instead of inverting the box
    box.on_mouse((0.9, 0.3), cv2.EVENT_LBUTTONDOWN)
    box.on_mouse((0.7, 0.05), cv2.EVENT_MOUSEMOVE)
    box.on_mouse((0.7, 0.05), cv2.EVENT_LBUTTONUP)
    _, (tl, br) = box.read()
    assert tl[0] <= br[0] and tl[1] <= br[1]
    assert abs(tl[0] - 0.7) < 1e-6
    # right-click resets to the full frame (reference clear() semantics)
    box.on_mouse((0.5, 0.5), cv2.EVENT_RBUTTONDOWN)
    _, (tl, br) = box.read()
    assert tl == (0.0, 0.0) and br == (1.0, 1.0)
    # draws box + handles
    frame = np.zeros((100, 200, 3), np.uint8)
    box.draw(frame, (200, 100))
    assert frame.any()


def test_mousepaint_paints_erases_and_reads_trail():
    paint = MousePaintOverlay(mask_hw=(64, 64), brush_radius_norm=0.1)
    changed, mask = paint.read_mask()
    assert not changed and not mask.any()
    paint.on_mouse((0.3, 0.5), cv2.EVENT_LBUTTONDOWN)
    paint.on_mouse((0.7, 0.5), cv2.EVENT_MOUSEMOVE)
    paint.on_mouse((0.7, 0.5), cv2.EVENT_LBUTTONUP)
    changed, mask = paint.read_mask()
    assert changed and mask[32, 32] == 255, "stroke should cover the center"
    finished, trail = paint.read_trail()
    assert finished and len(trail) >= 2 and trail[0] == (0.3, 0.5)
    assert paint.read_trail() == (False, ())  # popped
    # ctrl-drag erases the center
    paint.on_mouse((0.5, 0.5), cv2.EVENT_LBUTTONDOWN, cv2.EVENT_FLAG_CTRLKEY)
    paint.on_mouse((0.5, 0.5), cv2.EVENT_LBUTTONUP, cv2.EVENT_FLAG_CTRLKEY)
    _, mask = paint.read_mask()
    assert mask[32, 32] == 0 and mask.any(), "erase is local, rest of stroke remains"
    # tint + hover brush render onto a frame
    frame = np.zeros((100, 100, 3), np.uint8)
    paint.on_mouse((0.2, 0.2), cv2.EVENT_MOUSEMOVE)
    paint.draw(frame, (100, 100))
    assert frame.any()
    paint.clear()
    _, mask = paint.read_mask()
    assert not mask.any()


def test_overlaystack_base_skips_overlay_owned_drag():
    """Regression: an overlay claiming LBUTTONDOWN must keep the base element
    from also starting a drag it would never see end (the stack previously
    computed ownership before dispatching, so the base ghost-dragged and
    wants_mouse() stuck True forever)."""
    ms = MultiSlider("range", [20, 97], 0, 100)
    stack = OverlayStack(ms)
    box = stack.add_overlay(EditBoxOverlay(box=((0.2, 0.2), (0.6, 0.6))))
    stack.render(300)
    # click inside the edit box interior -> box drags, slider must not
    stack.on_mouse(120, 20, cv2.EVENT_LBUTTONDOWN)
    assert box.wants_mouse()
    before = list(ms.values)
    stack.on_mouse(200, 30, cv2.EVENT_MOUSEMOVE)
    stack.on_mouse(200, 30, cv2.EVENT_LBUTTONUP)
    assert list(ms.values) == before  # slider untouched
    assert not stack.wants_mouse()  # no stuck drag owner


# ---------------------------------------------------------------------------
# round-5 additions: image buttons + radio constraint (toadui/buttons.py
# :159 ToggleImageButton, :429 ImmediateImageButton, :547 RadioConstraint)


def test_immediate_image_button_click_and_letterbox():
    from muggled_dpt_tpu.demo_helpers.ui import ImmediateImageButton

    icon = np.full((20, 40, 3), 200, np.uint8)  # 2:1 aspect
    b = ImmediateImageButton(icon, height=40)
    frame = b.render(200)
    assert frame.shape == (40, 200, 3)
    # thumb is centered and aspect-preserved: widest fit is 32px tall x 64 wide
    assert (frame[20, 100] == 200).all(), "image pixels visible at center"
    assert b.read() is False
    b.on_mouse(100, 20, cv2.EVENT_LBUTTONDOWN)
    assert b.read() is True and b.read() is False  # popped
    # grayscale input promotes to BGR
    g = ImmediateImageButton(np.full((10, 10), 99, np.uint8))
    assert g.render(60).shape[2] == 3


def test_toggle_image_button_state_and_images():
    from muggled_dpt_tpu.demo_helpers.ui import ToggleImageButton

    off = np.full((16, 16, 3), 50, np.uint8)
    on = np.full((16, 16, 3), 250, np.uint8)
    b = ToggleImageButton(off, toggle_image=on, height=32)
    assert b.read() == (False, False)
    f_off = b.render(100)
    b.on_mouse(50, 16, cv2.EVENT_LBUTTONDOWN)
    assert b.read() == (True, True)
    f_on = b.render(100)
    assert int(f_on.sum()) > int(f_off.sum()), "distinct toggle image shown while ON"
    # without a toggle image the ON state is the accent outline
    b2 = ToggleImageButton(off, height=32, default=True)
    assert b2.is_on and b2.render(100).any()
    b2.toggle(set_on=False)
    assert b2.read() == (True, False)


def test_radio_constraint_enforces_one_active():
    from muggled_dpt_tpu.demo_helpers.ui import RadioConstraint

    a, b, c = ToggleButton("a"), ToggleButton("b", default=True), ToggleButton("c")
    radio = RadioConstraint(a, b, c, initial_active_index=0)
    changed, idx, item = radio.read()  # first read: forced initial state
    assert changed and idx == 0 and item is a
    assert a.is_on and not b.is_on and not c.is_on
    # user toggles c on -> c wins, a forced off
    c.toggle()
    changed, idx, item = radio.read()
    assert changed and idx == 2 and item is c and not a.is_on
    # toggling the active item OFF re-forces it on (always exactly one)
    c.toggle()
    changed, idx, _ = radio.read()
    assert not changed and idx == 2 and c.is_on
    # programmatic change_to by item
    radio.change_to(b)
    changed, idx, item = radio.read()
    assert changed and idx == 1 and item is b and not c.is_on
    assert [x.is_on for x in radio] == [False, True, False]
