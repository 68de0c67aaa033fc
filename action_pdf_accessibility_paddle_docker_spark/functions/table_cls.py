"""Wired vs wireless table classification decision (F5).

Mirrors /root/reference/src/ai.py:320-333 (``_use_wired_model``): compare the
top-2 classification scores; when score0 > score1 the decision is whether
label0 is 'wired_table', otherwise whether label0 is 'wireless_table' (the
reference's quirky else-branch: on a tie-or-lower first score it answers
"is the FIRST label wireless", preserved bit-for-bit).

In production this selects which cell-detection model to run
(RT-DETR-L_wired/wireless_table_cell_det, src/ai.py:294-307); with the stub
detector the cell boxes come from the payload so the decision is advisory
metadata, but the function is the seam the real pipeline plugs into.
"""

from __future__ import annotations


def use_wired_model(scores: list[float], label_names: list[str]) -> bool:
    """True -> wired cell-det model; False -> wireless."""
    if scores[0] > scores[1]:
        return label_names[0] == "wired_table"
    else:
        return label_names[0] == "wireless_table"


def cell_det_model_name(scores: list[float], label_names: list[str]) -> str:
    return (
        "RT-DETR-L_wired_table_cell_det"
        if use_wired_model(scores, label_names)
        else "RT-DETR-L_wireless_table_cell_det"
    )
