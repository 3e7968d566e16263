"""Cooperative two-agent CLI mode — the analogue of running the reference's
sender+receiver node pair (ORB_SLAM2.1 "Mono2" publishing keyframe batches,
ORB_SLAM2 "Mono" integrating them; SURVEY.md sections 2.2, 3.4-3.5), here
driven over the real native UDP-multicast bus (the LCM replacement) so the
full serialize -> socket -> deserialize -> wire-reconstruction path runs.
"""

import pytest

from coslam_tpu.cli import run_coop


@pytest.mark.slow
def test_coop_cli_udp_end_to_end():
    # 90 frames: the same arc-overlap geometry as the in-process merge test
    # (tests/test_cooperative.py) — 64 frames leaves only ~5 overlapping
    # frames between the agents' arcs, too thin for Sim3 verification
    try:
        res = run_coop(frames=90, transport="udp", publish_every=8)
    except OSError as e:  # no multicast loopback in this sandbox
        pytest.skip(f"UDP multicast unavailable: {e}")
    assert res["merges"] >= 1, "foreign sub-map never aligned"
    assert res["kf_foreign"] >= 6, "foreign keyframes missing"
    assert res["ate_joint_m"] < 0.3, f"joint ATE {res['ate_joint_m']:.3f} m"
