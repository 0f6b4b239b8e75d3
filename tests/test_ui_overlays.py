"""Overlay family + carousel (reference toadui/overlays.py, buttons.py).

Headless: renders to numpy frames and simulates cv2 mouse events through the
same on_mouse entry points DisplayWindow uses.
"""

import cv2
import numpy as np

from muggled_dpt_tpu.demo_helpers.ui import (
    BoxSelectOverlay,
    Carousel,
    CrosshairOverlay,
    GridSelectOverlay,
    ImageDisplay,
    MaskOverlay,
    PointClickOverlay,
    PolygonsOverlay,
    RectangleOverlay,
    TextOverlay,
)


def _display(w=200, h=100):
    d = ImageDisplay(np.zeros((h, w, 3), np.uint8))
    d.render(w)  # fixes _render_wh for normalized mouse math
    return d


def test_draw_overlays_change_pixels_and_respect_enabled():
    d = _display()
    text = d.add_overlay(TextOverlay("hello", anchor="topleft"))
    rect = d.add_overlay(RectangleOverlay())
    rect.set_boxes([((0.25, 0.25), (0.75, 0.75))])
    poly = d.add_overlay(PolygonsOverlay(fill_alpha=0.5))
    poly.set_polygons([[(0.1, 0.8), (0.2, 0.9), (0.05, 0.95)]])
    mask = d.add_overlay(MaskOverlay())
    m = np.zeros((10, 20), np.uint8)
    m[2:5, 3:9] = 1
    mask.set_mask(m)

    frame = d.render(200)
    assert frame.any(), "overlays should draw onto the black panel"
    for ov in (text, rect, poly, mask):
        ov.enabled = False
    assert not d.render(200).any()
    text.enabled = True
    text.set("")  # empty text draws nothing
    assert not d.render(200).any()


def test_crosshair_follows_hover_and_pins():
    d = _display()
    ch = d.add_overlay(CrosshairOverlay(show_label=False))
    assert not d.render(200).any()
    d.on_mouse(100, 50, cv2.EVENT_MOUSEMOVE)
    frame = d.render(200)
    assert frame[:, 100].any() and frame[50, :].any()
    d.on_mouse_elsewhere()
    assert not d.render(200).any()
    ch.set((0.25, 0.5))  # pinned: hover no longer moves it
    d.on_mouse(190, 90, cv2.EVENT_MOUSEMOVE)
    frame = d.render(200)
    col_coverage = frame.any(axis=2).sum(axis=0)  # set rows per column
    assert col_coverage[50] > 50, "vertical line stays at the pinned x"
    assert col_coverage[190] <= 4, "only the (anti-aliased) horizontal line crosses hover x"


def test_point_click_replace_shift_append_rightclick_clear():
    d = _display()
    pts = d.add_overlay(PointClickOverlay())
    d.on_mouse(50, 50, cv2.EVENT_LBUTTONDOWN)
    d.on_mouse(100, 20, cv2.EVENT_LBUTTONDOWN)  # plain click replaces
    changed, points = pts.read()
    assert changed and len(points) == 1 and abs(points[0][0] - 0.5) < 0.01
    d.on_mouse(150, 80, cv2.EVENT_LBUTTONDOWN, cv2.EVENT_FLAG_SHIFTKEY)
    _, points = pts.read()
    assert len(points) == 2
    d.on_mouse(0, 0, cv2.EVENT_RBUTTONDOWN)
    changed, points = pts.read()
    assert changed and points == ()


def test_box_select_drag_commit_replace_and_clear():
    d = _display()
    box = d.add_overlay(BoxSelectOverlay())
    d.on_mouse(20, 10, cv2.EVENT_LBUTTONDOWN)
    assert d.wants_mouse()  # overlay drag owns routing in stacks
    d.on_mouse(120, 60, cv2.EVENT_MOUSEMOVE)
    changed, boxes = box.read()
    assert changed and len(boxes) == 1  # in-progress box is reported
    d.on_mouse(120, 60, cv2.EVENT_LBUTTONUP)
    _, boxes = box.read()
    (tl, br) = boxes[0]
    assert np.allclose(tl, (0.1, 0.1), atol=0.01) and np.allclose(br, (0.6, 0.6), atol=0.01)
    assert not d.wants_mouse()

    # a plain new drag replaces the newest box; shift-drag adds a second
    d.on_mouse(10, 70, cv2.EVENT_LBUTTONDOWN)
    d.on_mouse(60, 95, cv2.EVENT_LBUTTONUP)
    _, boxes = box.read()
    assert len(boxes) == 1
    d.on_mouse(150, 10, cv2.EVENT_LBUTTONDOWN, cv2.EVENT_FLAG_SHIFTKEY)
    d.on_mouse(190, 40, cv2.EVENT_LBUTTONUP)
    _, boxes = box.read()
    assert len(boxes) == 2
    box.clear()
    changed, boxes = box.read()
    assert changed and boxes == ()


def test_box_select_discards_degenerate_drag():
    d = _display()
    box = d.add_overlay(BoxSelectOverlay())
    d.on_mouse(20, 10, cv2.EVENT_LBUTTONDOWN)
    d.on_mouse(20, 10, cv2.EVENT_LBUTTONUP)  # zero-area: a click, not a box
    _, boxes = box.read()
    assert boxes == ()


def test_box_select_drag_suppresses_marker_grab():
    d = _display()
    marker = d.add_marker((0.5, 0.5))
    d.add_overlay(BoxSelectOverlay())
    d.on_mouse(100, 50, cv2.EVENT_LBUTTONDOWN)  # starts a box on the marker
    d.on_mouse(150, 80, cv2.EVENT_MOUSEMOVE)
    d.on_mouse(150, 80, cv2.EVENT_LBUTTONUP)
    changed, xy = marker.read()
    assert not changed and xy == (0.5, 0.5)


def test_grid_select_hover_and_click():
    d = _display(w=160, h=80)
    grid = d.add_overlay(GridSelectOverlay((4, 8)))
    d.on_mouse(100, 30, cv2.EVENT_MOUSEMOVE)
    assert d.render(160).any()  # hover highlight draws
    d.on_mouse(100, 30, cv2.EVENT_LBUTTONDOWN)
    changed, cell = grid.read()
    assert changed and cell == (1, 5)
    d.on_mouse(100, 30, cv2.EVENT_LBUTTONDOWN)  # same cell: no change flag
    changed, cell = grid.read()
    assert not changed and cell == (1, 5)


def test_text_overlay_anchors_render_in_their_quadrant():
    d = _display(w=200, h=120)
    ov = d.add_overlay(TextOverlay("X", anchor="bottomright", bg_color=None, color=(255, 255, 255)))
    frame = d.render(200)
    ys, xs = np.nonzero(frame.any(axis=2))
    assert ys.mean() > 60 and xs.mean() > 100
    ov.anchor = "topleft"
    frame = d.render(200)
    ys, xs = np.nonzero(frame.any(axis=2))
    assert ys.mean() < 60 and xs.mean() < 100


def test_carousel_cycles_and_reads():
    c = Carousel("mode", ["a", "b", "c"])
    assert c.render(300).any()
    c.on_mouse(290, 10, cv2.EVENT_LBUTTONDOWN)  # right arrow -> next
    changed, idx, val = c.read()
    assert changed and idx == 1 and val == "b"
    c.on_mouse(5, 10, cv2.EVENT_LBUTTONDOWN)  # left arrow -> prev
    _, idx, val = c.read()
    assert idx == 0 and val == "a"
    c.on_mouse(5, 10, cv2.EVENT_LBUTTONDOWN)  # wraps
    _, idx, val = c.read()
    assert idx == 2 and val == "c"


def test_outline_overlay_hover_styling():
    from muggled_dpt_tpu.demo_helpers.ui import OutlineOverlay

    d = _display()
    ov = d.add_overlay(OutlineOverlay(color=(40, 40, 40), hover_color=(0, 255, 0), thickness=1, hover_thickness=2))
    frame = d.render(200)
    assert tuple(frame[0, 100]) == (40, 40, 40)  # top border, base color
    d.on_mouse(100, 50, cv2.EVENT_MOUSEMOVE)  # hover over the panel
    frame = d.render(200)
    assert tuple(frame[0, 100]) == (0, 255, 0)
    assert tuple(frame[1, 100]) == (0, 255, 0)  # hover thickness 2
    d.on_mouse_elsewhere()
    assert tuple(d.render(200)[0, 100]) == (40, 40, 40)


def test_custom_overlay_draw_fn_and_hover_xy():
    from muggled_dpt_tpu.demo_helpers.ui import CustomOverlay

    d = _display()
    seen = []

    def draw(frame, xy_norm):
        seen.append(xy_norm)
        frame[:, :, 2] = 200  # draw in place

    ov = d.add_overlay(CustomOverlay(draw))
    assert d.render(200)[0, 0, 2] == 200 and seen[-1] is None
    d.on_mouse(150, 50, cv2.EVENT_MOUSEMOVE)
    d.render(200)
    assert seen[-1] is not None and abs(seen[-1][0] - 0.75) < 0.02

    # returned-frame form (the reference's fn(frame)->frame contract)
    ov.set_render(lambda frame, xy: np.full_like(frame, 7))
    assert (d.render(200) == 7).all()
    ov.set_render(None)  # disabled
    assert not d.render(200).any()


def test_path_carousel_shows_basename_keeps_full_path():
    from muggled_dpt_tpu.demo_helpers.ui import PathCarousel

    car = PathCarousel("model", ["/a/b/first.pt", "/a/b/second.pt"])
    img = car.render(300)
    assert img.shape[0] == car.height
    assert car.value == "/a/b/first.pt" and car._display_text() == "first.pt"
    car.on_mouse(290, 10, cv2.EVENT_LBUTTONDOWN)  # right arrow -> next
    changed, idx, value = car.read()
    assert changed and idx == 1 and value == "/a/b/second.pt"
