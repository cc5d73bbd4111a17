"""X7 window/tray logic: hide-on-close + the 600 ms tray blur grace."""

from crispy_tpu.api.events import EventBus
from crispy_tpu.api.window import WindowManager


class Clock:
    def __init__(self):
        self.t = 50.0

    def __call__(self):
        return self.t


def test_main_close_hides_and_flips_policy():
    wm = WindowManager(bus=EventBus(), clock=Clock())
    assert wm.request_close_main() is False  # prevent_close
    assert not wm.main_visible and wm.accessory_policy
    wm.show_main()
    assert wm.main_visible and not wm.accessory_policy


def test_tray_blur_grace_period():
    clock = Clock()
    bus = EventBus()
    bus.keep_history = True
    wm = WindowManager(bus=bus, clock=clock)
    wm.show_tray_popup()
    clock.t += 0.3  # inside the 600 ms grace: blur ignored
    assert wm.tray_popup_blurred() is False
    assert wm.tray_popup_visible
    clock.t += 0.5  # past the grace: blur hides
    assert wm.tray_popup_blurred() is True
    assert not wm.tray_popup_visible
    evs = [p for e, p in bus.history if e == "window-state"]
    assert evs[-1] == {"window": "tray-popup", "visible": False}


def test_tray_toggle():
    wm = WindowManager(bus=EventBus(), clock=Clock())
    wm.toggle_tray_popup()
    assert wm.tray_popup_visible
    wm.toggle_tray_popup()
    assert not wm.tray_popup_visible


def test_app_wires_window_manager(data_root):
    from crispy_tpu.api.commands import CrispyApp

    app = CrispyApp(bus=EventBus())
    app.windows.request_close_main()
    assert not app.windows.main_visible
    app.show_main_window_cmd()
    assert app.windows.main_visible
