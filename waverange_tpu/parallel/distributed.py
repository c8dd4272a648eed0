"""Multi-host (pod-slice) execution helpers.

The reference's "multi-node" story is PROCID-sharded files processed by
independent processes (SURVEY §2 item 5). Here a pod slice runs one
Python process per host: `jax.distributed` initializes the global mesh,
each host encodes the fields/subdomains whose data it holds, and the
host-side writer concatenates the variable-length streams in original
file order (rank-ordered exchange over the JAX process group).

Tested for real with 2 OS processes on the CPU backend (localhost
coordinator) in tests/test_distributed_multiprocess.py; the single-host
path is the degenerate case.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def gather_streams_ordered(local_streams: Sequence[bytes],
                           local_ids: Sequence[int]) -> List[bytes]:
    """All processes contribute (id, stream) pairs; process 0 receives
    the full id-ordered list (others get []). Uses
    `jax.experimental.multihost_utils` byte-array gathers so the
    exchange rides the same transport as the training collectives.

    Single-process: returns the locally ordered streams."""
    import jax

    if jax.process_count() == 1:
        order = np.argsort(np.asarray(local_ids, np.int64), kind="stable")
        return [local_streams[i] for i in order]

    from jax.experimental import multihost_utils as mhu

    # lengths first (fixed-size gather), then a padded byte matrix
    nloc = len(local_streams)
    counts = mhu.process_allgather(np.asarray([nloc], np.int64))
    maxn = int(counts.max())
    lens = np.zeros(maxn, np.int64)
    ids = np.full(maxn, -1, np.int64)
    for i, (s, fid) in enumerate(zip(local_streams, local_ids)):
        lens[i] = len(s)
        ids[i] = fid
    all_lens = mhu.process_allgather(lens)     # (P, maxn)
    all_ids = mhu.process_allgather(ids)
    maxlen = int(all_lens.max()) if all_lens.size else 0
    buf = np.zeros((maxn, maxlen), np.uint8)
    for i, s in enumerate(local_streams):
        buf[i, :len(s)] = np.frombuffer(s, np.uint8)
    all_buf = mhu.process_allgather(buf)       # (P, maxn, maxlen)

    if jax.process_index() != 0:
        return []
    items = []
    for p in range(all_buf.shape[0]):
        for i in range(maxn):
            if all_ids[p, i] >= 0:
                items.append((int(all_ids[p, i]),
                              all_buf[p, i, :all_lens[p, i]].tobytes()))
    items.sort(key=lambda t: t[0])
    return [s for (_, s) in items]
