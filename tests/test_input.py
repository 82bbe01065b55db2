"""InputTracker tests (application/input/input.hpp behavior)."""

import numpy as np

from granite_tpu.app.input import (
    FPSCameraInput, InputTracker, Key, KeyboardEvent, KeyState,
    MouseButton, MouseMoveEvent,
)
from granite_tpu.event.manager import EventManager
from granite_tpu.scene.camera import FPSCamera


def _tracker():
    return InputTracker(EventManager())


def test_key_state_bitmask():
    t = _tracker()
    assert not t.key_pressed(Key.W)
    t.key_event(Key.W, KeyState.PRESSED)
    t.key_event(Key.A, KeyState.PRESSED)
    assert t.key_pressed(Key.W) and t.key_pressed(Key.A)
    t.key_event(Key.W, KeyState.RELEASED)
    assert not t.key_pressed(Key.W) and t.key_pressed(Key.A)
    # Repeat does not change the held set (input.hpp KeyState::Repeat).
    t.key_event(Key.A, KeyState.REPEAT)
    assert t.key_pressed(Key.A)


def test_mouse_buttons_and_deltas():
    t = _tracker()
    moves = []
    t._manager.register_handler(MouseMoveEvent,
                                lambda e: moves.append(e))
    t.mouse_button_event(MouseButton.RIGHT, 10, 10, True)
    assert t.mouse_button_pressed(MouseButton.RIGHT)
    t.mouse_move_event_absolute(10, 10)      # first move primes state
    t.mouse_move_event_absolute(14, 7)
    assert moves[-1].delta_x == 4 and moves[-1].delta_y == -3
    assert moves[-1].get_mouse_button_pressed(MouseButton.RIGHT)
    t.mouse_button_event(MouseButton.RIGHT, 14, 7, False)
    assert not t.mouse_button_pressed(MouseButton.RIGHT)


def test_keyboard_events_dispatch_and_repeat():
    t = _tracker()
    seen = []
    t._manager.register_handler(KeyboardEvent, lambda e: seen.append(
        (e.key, e.state)))
    t.key_event(Key.W, KeyState.PRESSED)
    t.key_event(Key.S, KeyState.PRESSED)
    t.dispatch_current_state(1 / 60)
    repeats = [k for k, s in seen if s == KeyState.REPEAT]
    assert Key.W in repeats and Key.S in repeats


def test_fps_camera_binding():
    mgr = EventManager()
    t = InputTracker(mgr)
    cam = FPSCamera()
    cam.look_at(np.zeros(3), np.array([0.0, 0.0, -1.0]))
    FPSCameraInput(cam, t)
    p0 = cam.position.copy()
    t.key_event(Key.W, KeyState.PRESSED)
    t.dispatch_current_state(1 / 60)
    assert cam.position[2] < p0[2]           # moved forward (-Z)
    # look: right-drag rotates, plain move does not
    r0 = cam.rotation.copy()
    t.mouse_move_event_relative(5, 0)
    assert np.allclose(cam.rotation, r0)
    t.mouse_button_event(MouseButton.RIGHT, 0, 0, True)
    t.mouse_move_event_relative(5, 0)
    assert not np.allclose(cam.rotation, r0)
