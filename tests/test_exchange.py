"""Device-collective keyframe exchange (parallel/exchange.py) on the
8-device virtual CPU mesh: the ICI analogue of the reference's LCM UDP
multicast (SURVEY.md 2.5 P5)."""

import numpy as np

from coslam_tpu.models.cooperative import KeyFramePacket
from coslam_tpu.parallel import exchange as ex
from coslam_tpu.parallel.mesh import make_mesh

N_KP = 64
BATCH = 4


def _pkt(rng, agent_id, frame_id):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = rng.normal(size=3)
    return KeyFramePacket(
        agent_id=agent_id,
        frame_id=frame_id,
        pose=pose,
        uv=rng.uniform(0, 320, (N_KP, 2)).astype(np.float32),
        level=rng.integers(0, 8, N_KP).astype(np.int32),
        angle=rng.uniform(0, 360, N_KP).astype(np.float32),
        desc=rng.integers(0, 2**32, (N_KP, 8), dtype=np.uint64)
            .astype(np.uint32),
        kp_valid=rng.uniform(size=N_KP) < 0.9,
        pt_flag=rng.uniform(size=N_KP) < 0.5,
        pt_world=rng.normal(size=(N_KP, 3)).astype(np.float32),
        pt_id=rng.integers(0, 1000, N_KP).astype(np.int64),
    )


def test_collective_exchange_roundtrip(rng):
    mesh = make_mesh(n_agents=2)
    sent = {a: [_pkt(rng, a, f) for f in range(2 + a)] for a in range(2)}
    blocks = [ex.stack_packets(sent[a], BATCH, N_KP, a) for a in range(2)]
    gathered = ex.exchange(mesh, blocks)

    # every agent sees every batch, padding rows excluded
    got = ex.unstack_packets(gathered)
    assert len(got) == 5
    # agent 0's view excludes its own packets (multicast self-filter)
    got0 = ex.unstack_packets(gathered, skip_agent=0)
    assert [p.agent_id for p in got0] == [1, 1, 1]
    # payload survives the collective bit-exactly
    orig = sent[1][2]
    back = got0[2]
    assert back.frame_id == orig.frame_id
    np.testing.assert_array_equal(back.desc, orig.desc)
    np.testing.assert_array_equal(back.uv, orig.uv)
    np.testing.assert_array_equal(back.pt_id, orig.pt_id)
    np.testing.assert_allclose(back.pose, orig.pose)


def test_collective_bus_interface(rng):
    mesh = make_mesh(n_agents=2)
    bus = ex.CollectiveBus(mesh, batch=BATCH, n_kp=N_KP)
    bus.publish(0, [_pkt(rng, 0, 7)])
    bus.publish(1, [_pkt(rng, 1, 9), _pkt(rng, 1, 10)])  # triggers flush
    got0 = bus.drain(0)
    got1 = bus.drain(1)
    assert [p.frame_id for p in got0] == [9, 10]
    assert [p.frame_id for p in got1] == [7]
    # second round: only one publisher; drain flushes the stragglers
    bus.publish(1, [_pkt(rng, 1, 11)])
    assert [p.frame_id for p in bus.drain(0)] == [11]
    assert bus.drain(1) == []
