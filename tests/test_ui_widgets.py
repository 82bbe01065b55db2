"""Retained UI widget tree (ui/widgets.py; reference ui/ui_manager.hpp:44,
widget.hpp:49, slider.cpp, window.cpp): layout, hit-testing, input
capture, and the InputTracker filter hook."""

import numpy as np

from granite_tpu.ui.widgets import (
    ClickButton, HorizontalPacking, Label, Slider, ToggleButton,
    UIManager, VerticalPacking, Window,
)


def make_ui(w=320, h=200):
    return UIManager(w, h)


def test_vertical_packing_layout():
    ui = make_ui()
    win = ui.add_child(Window("w"))
    a = win.add_child(Label("aaaa"))
    b = win.add_child(Label("bb"))
    ui.render()
    # children stacked top-down inside the window body, margins applied
    assert a.y >= win.y + Window.TITLE_H
    assert b.y >= a.y + a.h
    assert a.x >= win.x and a.x + a.w <= win.x + win.w + 1e-6
    # window sized to content
    aw, ah = a.measure()
    assert win.h >= Window.TITLE_H + ah


def test_horizontal_packing_flexible_share():
    ui = make_ui()
    row = HorizontalPacking()
    row.set_minimum_geometry(300, 20)
    fixed = row.add_child(Label("xx"))
    flex1 = row.add_child(Label(""))
    flex1.size_is_flexible = True
    flex2 = row.add_child(Label(""))
    flex2.size_is_flexible = True
    row.layout(0, 0, 300, 20)
    assert fixed.x < flex1.x < flex2.x
    # the two flexible children share the leftover equally
    assert abs(flex1.w - flex2.w) < 1e-4


def test_click_button_fires_on_release_inside():
    ui = make_ui()
    win = ui.add_child(Window("w"))
    clicks = []
    btn = win.add_child(ClickButton("go", on_click=lambda: clicks.append(1)))
    ui.render()
    cx = btn.x + btn.w / 2
    cy = btn.y + btn.h / 2
    assert ui.filter_input_event("press", cx, cy)
    assert ui.filter_input_event("release", cx, cy)
    assert clicks == [1]
    # release OUTSIDE cancels (click_button.cpp behavior)
    assert ui.filter_input_event("press", cx, cy)
    assert ui.filter_input_event("release", -10, -10)
    assert clicks == [1]


def test_toggle_button_latches():
    ui = make_ui()
    win = ui.add_child(Window("w"))
    states = []
    tgl = win.add_child(ToggleButton("t", on_toggle=states.append))
    ui.render()
    cx, cy = tgl.x + 2, tgl.y + 2
    for _ in range(3):
        ui.filter_input_event("press", cx, cy)
        ui.filter_input_event("release", cx, cy)
    assert states == [True, False, True]


def test_slider_drag_maps_to_range():
    ui = make_ui()
    win = ui.add_child(Window("w"))
    vals = []
    s = win.add_child(Slider("s", lo=10.0, hi=20.0, value=10.0,
                             on_value=vals.append))
    ui.render()
    tx, tw = s._track()
    ui.filter_input_event("press", tx, s.y + s.h / 2)
    assert abs(s.value - 10.0) < 1e-4
    # drag to the right end — capture keeps routing move events
    ui.filter_input_event("move", tx + tw, s.y + s.h / 2)
    assert abs(s.value - 20.0) < 1e-4
    # beyond the track clamps
    ui.filter_input_event("move", tx + 2 * tw, s.y + s.h / 2)
    assert abs(s.value - 20.0) < 1e-4
    ui.filter_input_event("release", tx + tw, s.y + s.h / 2)
    assert not s.dragging
    assert vals[-1] == 20.0


def test_window_title_drag_moves_window():
    ui = make_ui()
    win = ui.add_child(Window("w"))
    win.add_child(Label("content"))
    ui.render()
    x0, y0 = win.floating_position
    ui.filter_input_event("press", win.x + 5, win.y + 3)   # title bar
    ui.filter_input_event("move", win.x + 45, win.y + 33)
    ui.filter_input_event("release", win.x + 45, win.y + 33)
    assert win.floating_position == (x0 + 40, y0 + 30)
    # next render lays the window out at the new position
    ui.render()
    assert (win.x, win.y) == win.floating_position


def test_events_outside_ui_not_consumed():
    ui = make_ui()
    ui.add_child(Window("w")).add_child(Label("x"))
    ui.render()
    assert not ui.filter_input_event("press", 310, 190)
    assert not ui.filter_input_event("move", 310, 190)
    assert not ui.filter_input_event("release", 310, 190)


def test_input_tracker_filter_hook():
    from granite_tpu.app.input import InputTracker, MouseButton
    from granite_tpu.event.manager import EventManager

    em = EventManager()
    tracker = InputTracker(em)
    seen = []
    from granite_tpu.app.input import MouseButtonEvent
    em.register_handler(MouseButtonEvent, lambda e: seen.append(e))

    ui = make_ui()
    win = ui.add_child(Window("w"))
    win.add_child(ClickButton("b"))
    ui.render()
    tracker.input_filter = ui.filter_input_event

    # click inside the window: consumed, no camera event
    tracker.mouse_button_event(MouseButton.LEFT, win.x + 4, win.y + 2,
                               True)
    tracker.mouse_button_event(MouseButton.LEFT, win.x + 4, win.y + 2,
                               False)
    assert seen == []
    # click outside: passes through to the event manager
    tracker.mouse_button_event(MouseButton.LEFT, 310, 190, True)
    assert len(seen) == 1


def test_render_writes_overlay_pixels():
    ui = make_ui()
    win = ui.add_child(Window("hello"))
    win.add_child(Label("stats"))
    overlay = ui.render()
    assert overlay.shape == (200, 320, 4)
    # window background + title bar leave nonzero alpha
    region = overlay[int(win.y):int(win.y + win.h),
                     int(win.x):int(win.x + win.w)]
    assert (region[..., 3] > 0).mean() > 0.9
    # outside the window stays clear
    assert overlay[190:, 300:, 3].max() == 0.0


def test_sprite_atlas_and_batched_flush():
    """Sprite batching (ui/sprite.py; renderer/sprite.cpp +
    flat_renderer queue semantics): atlas packing, layer-sorted flush,
    scale + tint, clipping."""
    from granite_tpu.ui.flat_renderer import FlatRenderer
    from granite_tpu.ui.sprite import SpriteAtlas, SpriteRenderer

    atlas = SpriteAtlas(64)
    red = np.zeros((8, 8, 4), np.float32)
    red[..., 0] = red[..., 3] = 1.0
    blue = np.zeros((8, 8, 4), np.float32)
    blue[..., 2] = blue[..., 3] = 1.0
    s_red = atlas.add(red)
    s_blue = atlas.add(blue)
    assert atlas.rects[s_blue][0] == 8        # shelf-packed side by side

    fr = FlatRenderer(64, 32)
    fr.begin()
    sr = SpriteRenderer(atlas)
    # blue queued FIRST but on a HIGHER layer -> drawn last (on top)
    sr.queue_sprite(s_blue, 4, 4, layer=1.0)
    sr.queue_sprite(s_red, 4, 4, layer=0.0)
    assert sr.flush(fr) == 2
    assert np.allclose(fr.canvas[6, 6, :3], [0, 0, 1])   # blue on top

    # scale + tint + edge clip
    fr.begin()
    sr.queue_sprite(s_red, 60, 0, scale=2.0, color=(1, 1, 0.5, 1.0))
    sr.flush(fr)
    assert fr.canvas[2, 62, 0] > 0.9          # clipped but visible
    assert fr.canvas.shape == (32, 64, 4)     # no overflow write
    # queue drained
    assert sr.flush(fr) == 0
