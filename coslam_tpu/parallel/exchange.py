"""Device-collective keyframe exchange over the mesh "agent" axis.

The reference's cooperative transport is LCM UDP multicast: the sender
serializes batches of <= 10 keyframes and publishes them on channel
"KeyFrameexample" (ORB_SLAM2.1/.../ros_mono.cc:1915-2399) and every peer
receives the batch best-effort (ORB_SLAM2/.../ros_mono.cc:602).  When the
cooperating agents live on chips of the SAME TPU slice, serializing map
state out to a host socket is a waste of both HBM bandwidth and ICI: the
natural transport is a collective.

This module is that transport (SURVEY.md 2.5 P5 / 5.8):

  * keyframe packets are staged into a fixed-width, padded `PacketBlock`
    pytree (float32 keypoints, packed uint32 descriptors — the reference's
    wire format without its int16 keypoint quantization or float-encoded
    descriptors, SURVEY.md 2.3);
  * each agent owns one leading-axis slice of the block, sharded over the
    mesh "agent" axis;
  * `exchange()` runs an `all_gather` over that axis under `shard_map`, so
    after one collective every agent holds every other agent's newest
    keyframe batch — the multicast semantics of LCM, carried on ICI.

Host-process peers that do NOT share a slice keep using the native UDP bus
(coslam_tpu/native) with the same packet schema; `CollectiveBus` exposes the
same publish/drain interface so CoopAgent code is transport-agnostic.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coslam_tpu.models.cooperative import KeyFramePacket


class PacketBlock(NamedTuple):
    """A fixed-capacity batch of keyframe packets as stacked arrays.

    Leading axes: (n_agents, batch, ...) once gathered; one agent stages a
    (batch, ...) slice.  `count` is the number of live packets per agent;
    rows past `count` are padding (kp_valid all False).
    """
    count: jnp.ndarray      # (A,) int32
    agent_id: jnp.ndarray   # (A, B) int32
    frame_id: jnp.ndarray   # (A, B) int32
    pose: jnp.ndarray       # (A, B, 4, 4) float32
    uv: jnp.ndarray         # (A, B, N, 2) float32
    level: jnp.ndarray      # (A, B, N) int32
    angle: jnp.ndarray      # (A, B, N) float32
    desc: jnp.ndarray       # (A, B, N, 8) uint32
    kp_valid: jnp.ndarray   # (A, B, N) bool
    pt_flag: jnp.ndarray    # (A, B, N) bool
    pt_world: jnp.ndarray   # (A, B, N, 3) float32
    pt_id: jnp.ndarray      # (A, B, N) int32


def stack_packets(pkts: Sequence[KeyFramePacket], batch: int, n_kp: int,
                  agent_id: int) -> PacketBlock:
    """Stage up to `batch` packets into one agent's (1, B, ...) block slice.

    Fixed shapes keep the exchange jittable; overflow packets must be sent
    in a later round (the reference has the same cadence limit: <= 10 KFs
    per publish, ros_mono.cc:1948).
    """
    if len(pkts) > batch:
        raise ValueError(f"{len(pkts)} packets > block capacity {batch}")
    B, N = batch, n_kp

    def z(shape, dtype):
        return np.zeros(shape, dtype)

    blk = PacketBlock(
        count=np.asarray([len(pkts)], np.int32),
        agent_id=np.full((1, B), agent_id, np.int32),
        frame_id=z((1, B), np.int32),
        pose=np.tile(np.eye(4, dtype=np.float32), (1, B, 1, 1)),
        uv=z((1, B, N, 2), np.float32),
        level=z((1, B, N), np.int32),
        angle=z((1, B, N), np.float32),
        desc=z((1, B, N, 8), np.uint32),
        kp_valid=z((1, B, N), bool),
        pt_flag=z((1, B, N), bool),
        pt_world=z((1, B, N, 3), np.float32),
        pt_id=np.full((1, B, N), -1, np.int32),
    )
    for j, p in enumerate(pkts):
        blk.agent_id[0, j] = p.agent_id
        blk.frame_id[0, j] = p.frame_id
        blk.pose[0, j] = p.pose
        blk.uv[0, j] = p.uv
        blk.level[0, j] = p.level
        blk.angle[0, j] = p.angle
        blk.desc[0, j] = p.desc
        blk.kp_valid[0, j] = p.kp_valid
        blk.pt_flag[0, j] = p.pt_flag
        blk.pt_world[0, j] = p.pt_world
        blk.pt_id[0, j] = p.pt_id.astype(np.int32)
    return blk


def unstack_packets(blk: PacketBlock, skip_agent: Optional[int] = None
                    ) -> List[KeyFramePacket]:
    """Gathered (A, B, ...) block -> list of live packets (numpy, host)."""
    out: List[KeyFramePacket] = []
    count = np.asarray(blk.count).reshape(-1)
    for a in range(count.shape[0]):
        if skip_agent is not None and int(np.asarray(blk.agent_id)[a, 0]) \
                == skip_agent:
            continue
        for j in range(int(count[a])):
            out.append(KeyFramePacket(
                agent_id=int(np.asarray(blk.agent_id)[a, j]),
                frame_id=int(np.asarray(blk.frame_id)[a, j]),
                pose=np.asarray(blk.pose)[a, j],
                uv=np.asarray(blk.uv)[a, j],
                level=np.asarray(blk.level)[a, j],
                angle=np.asarray(blk.angle)[a, j],
                desc=np.asarray(blk.desc)[a, j],
                kp_valid=np.asarray(blk.kp_valid)[a, j],
                pt_flag=np.asarray(blk.pt_flag)[a, j],
                pt_world=np.asarray(blk.pt_world)[a, j],
                pt_id=np.asarray(blk.pt_id)[a, j].astype(np.int64),
            ))
    return out


@functools.lru_cache(maxsize=8)
def _exchange_fn(mesh: Mesh):
    spec_in = PacketBlock(*([P("agent")] * len(PacketBlock._fields)))
    spec_out = PacketBlock(*([P()] * len(PacketBlock._fields)))

    def gather(blk: PacketBlock) -> PacketBlock:
        # one all_gather per leaf over the agent axis: every agent ends up
        # holding every agent's batch (LCM-multicast semantics on ICI)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, "agent", axis=0, tiled=True),
            blk)

    # all_gather(tiled) output is replicated over "agent", but newer JAX
    # vma inference cannot prove it; disable the check where supported.
    try:
        smap = jax.shard_map(gather, mesh=mesh, in_specs=(spec_in,),
                             out_specs=spec_out, check_vma=False)
    except TypeError:
        smap = jax.shard_map(gather, mesh=mesh, in_specs=(spec_in,),
                             out_specs=spec_out)
    return jax.jit(smap)


def exchange(mesh: Mesh, blocks: Sequence[PacketBlock]) -> PacketBlock:
    """All-to-all keyframe broadcast: one (1, B, ...) block per agent in,
    the fully gathered replicated (A, B, ...) block out."""
    n_agents = mesh.shape["agent"]
    if len(blocks) != n_agents:
        raise ValueError(f"{len(blocks)} blocks for {n_agents} agents")
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=0),
        *blocks)
    sharded = jax.device_put(
        stacked, NamedSharding(mesh, P("agent")))
    return _exchange_fn(mesh)(sharded)


class CollectiveBus:
    """publish/drain transport (same interface as InMemoryBus / UdpBus)
    backed by the mesh collective.

    Publishes are staged per agent; the all_gather fires once every agent
    has either published or been flushed, then each agent drains the
    replicated block.  This models the SPMD exchange for in-process
    multi-agent runs and tests; real multi-host deployments invoke
    `exchange()` directly inside their jitted step.
    """

    def __init__(self, mesh: Mesh, batch: int, n_kp: int):
        self.mesh = mesh
        self.batch = batch
        self.n_kp = n_kp
        self.n_agents = mesh.shape["agent"]
        self._staged: Dict[int, List[KeyFramePacket]] = {}
        self._inbox: Dict[int, List[KeyFramePacket]] = {
            a: [] for a in range(self.n_agents)}

    def publish(self, sender: int, pkts: List[KeyFramePacket],
                subscribers=None) -> None:
        self._staged.setdefault(sender, []).extend(pkts)
        if len(self._staged) == self.n_agents:
            self.flush()

    def flush(self) -> None:
        """Run the collective over whatever is staged (agents that have not
        published contribute an empty block — like silence on multicast)."""
        blocks = [stack_packets(self._staged.get(a, [])[: self.batch],
                                self.batch, self.n_kp, a)
                  for a in range(self.n_agents)]
        gathered = exchange(self.mesh, blocks)
        for a in range(self.n_agents):
            self._inbox[a].extend(unstack_packets(gathered, skip_agent=a))
        self._staged.clear()

    def drain(self, agent_id: int, timeout_ms: int = 0
              ) -> List[KeyFramePacket]:
        if self._staged:
            self.flush()
        out = self._inbox[agent_id]
        self._inbox[agent_id] = []
        return out
