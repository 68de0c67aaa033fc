"""F5 wired/wireless decision (reference src/ai.py:320-333, quirk preserved:
the else-branch asks whether the FIRST label is wireless)."""

from action_pdf_accessibility_paddle_docker_spark.functions.table_cls import (
    cell_det_model_name,
    use_wired_model,
)


def test_clear_winner_wired():
    assert use_wired_model([0.9, 0.1], ["wired_table", "wireless_table"]) is True
    assert use_wired_model([0.9, 0.1], ["wireless_table", "wired_table"]) is False


def test_tie_or_lower_uses_quirky_else_branch():
    # scores equal -> else branch: is label0 wireless?
    assert use_wired_model([0.5, 0.5], ["wireless_table", "wired_table"]) is True
    assert use_wired_model([0.5, 0.5], ["wired_table", "wireless_table"]) is False
    # score0 < score1: same else branch
    assert use_wired_model([0.2, 0.8], ["wireless_table", "wired_table"]) is True


def test_model_name():
    assert cell_det_model_name([0.9, 0.1], ["wired_table", "wireless_table"]) == (
        "RT-DETR-L_wired_table_cell_det"
    )
    assert cell_det_model_name([0.1, 0.9], ["wired_table", "wireless_table"]) == (
        "RT-DETR-L_wireless_table_cell_det"
    )
