"""Stereographic missing-center fix (sten_proj::estimate_circle /
disk_reproj / inpaint, /root/reference/src/math/_projection.cpp:87-294,
327-419).

Implementation lands with the stereographic milestone; until then the fix
degrades gracefully exactly like the reference does when no central hole
is found (_projection.cpp:403-407: "No midsection found" -> skip).
"""

from __future__ import annotations

import warnings


def apply_center_fix(params, cfg) -> None:
    warnings.warn("stereographic center fix not yet implemented; "
                  "proceeding without it (reference fallback path)")
