"""API layer: the reference's command surface + event bus.

  events    — emit/listen bus mirroring the Tauri event channel
  commands  — the 54-command catalog (main.rs:372-425) as Python callables
"""
