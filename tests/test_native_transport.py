"""Native C++ UDP-multicast transport (the LCM replacement)."""

import shutil

import numpy as np
import pytest

g_pp = shutil.which("g++")
pytestmark = pytest.mark.skipif(g_pp is None, reason="no g++ available")


def test_build_and_roundtrip():
    from coslam_tpu import native

    a = native.Transport(port=17667)
    b = native.Transport(port=17667)
    try:
        a.publish("chan", b"hello world")
        got = None
        for _ in range(20):
            got = b.receive(timeout_ms=200)
            if got:
                break
        assert got == ("chan", b"hello world")
    finally:
        a.close()
        b.close()


def test_large_message_fragmentation():
    from coslam_tpu import native

    a = native.Transport(port=17668)
    b = native.Transport(port=17668)
    try:
        rng = np.random.default_rng(0)
        payload = rng.integers(0, 256, 1_500_000, dtype=np.uint8).tobytes()
        a.publish("big", payload)
        got = None
        for _ in range(50):
            got = b.receive(timeout_ms=200)
            if got:
                break
        assert got is not None, "large message lost"
        assert got[0] == "big" and got[1] == payload
    finally:
        a.close()
        b.close()


def test_udp_bus_keyframe_packets():
    from coslam_tpu.models import cooperative as coop

    N = 64
    rng = np.random.default_rng(1)
    pkt = coop.KeyFramePacket(
        agent_id=1, frame_id=42, pose=np.eye(4, dtype=np.float32),
        uv=rng.uniform(0, 640, (N, 2)).astype(np.float32),
        level=rng.integers(0, 8, N).astype(np.int32),
        angle=rng.uniform(-3, 3, N).astype(np.float32),
        desc=rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32),
        kp_valid=np.ones(N, bool),
        pt_flag=rng.random(N) < 0.5,
        pt_world=rng.standard_normal((N, 3)).astype(np.float32),
        pt_id=np.arange(N, dtype=np.int64),
    )
    tx = coop.UdpBus(port=17669)
    rx = coop.UdpBus(port=17669)
    try:
        tx.publish(1, [pkt])
        got = []
        for _ in range(20):
            got = rx.drain(agent_id=0, timeout_ms=200)
            if got:
                break
        assert len(got) == 1
        g = got[0]
        assert g.agent_id == 1 and g.frame_id == 42
        np.testing.assert_array_equal(g.desc, pkt.desc)
        np.testing.assert_allclose(g.uv, pkt.uv)
        np.testing.assert_array_equal(g.pt_id, pkt.pt_id)
        # self-messages are filtered
        assert rx.drain(agent_id=1, timeout_ms=50) == []
    finally:
        tx.close()
        rx.close()
