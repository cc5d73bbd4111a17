"""Updater analog (X9: the tauri-plugin-updater wired in main.rs:221).

The reference ships Tauri's updater plugin: the app fetches a signed
release manifest, compares versions, and installs in place. For a
pip-installed server package the honest analog is the package index:
`check_for_updates` asks PyPI for the newest `crispy-tpu` release and
reports whether an upgrade exists; *applying* it is surfaced as the
`pip install --upgrade` command rather than auto-run — a server host
should not mutate its own environment mid-session. Offline (the normal
state on an egress-less TPU host) reports `"offline"` rather than
erroring, mirroring the plugin's silent no-manifest behavior.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Dict, Optional, Tuple

PACKAGE = "crispy-tpu"
INDEX_URL = f"https://pypi.org/pypi/{PACKAGE}/json"
UPDATE_COMMAND = f"pip install --upgrade {PACKAGE}"


def _version_key(v: str) -> Tuple:
    """Order-comparable key for PEP-440-ish versions; unparseable parts
    compare as strings after every numeric part (good enough to order
    releases; exotic pre-release tags just compare lexically)."""
    parts: list = []
    for tok in v.replace("-", ".").split("."):
        parts.append((0, int(tok)) if tok.isdigit() else (1, tok))
    return tuple(parts)


def current_version() -> str:
    from .. import __version__

    return __version__


def check_for_updates(timeout: float = 5.0,
                      index_url: Optional[str] = None) -> Dict[str, str]:
    """One-shot update check → status dict (never raises).

    status: "update-available" | "up-to-date" | "offline".
    """
    cur = current_version()
    out = {"status": "offline", "current_version": cur,
           "update_command": UPDATE_COMMAND}
    try:
        with urllib.request.urlopen(index_url or INDEX_URL,
                                    timeout=timeout) as r:
            info = json.loads(r.read())
        latest = str(info["info"]["version"])
    except Exception:  # DNS failure, timeout, bad JSON: all mean "no manifest"
        return out
    out["latest_version"] = latest
    out["status"] = ("update-available"
                     if _version_key(latest) > _version_key(cur)
                     else "up-to-date")
    return out
