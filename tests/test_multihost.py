"""Multi-host scaffolding: per-host video segments, global-mesh helper,
distributed bootstrap no-op path (SURVEY.md §2.10 'Host I/O sharding' /
'Device mesh & runtime')."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.io.video import (VideoSource, host_batches,
                                             host_segment)
from stereo_depth_ruler_tpu.parallel.mesh import (initialize_distributed,
                                                  make_global_mesh)


def test_host_segment_partition():
    # segments cover [0, n) exactly once, in order, batch-aligned
    for n, pc, batch in [(100, 4, 8), (7, 3, 2), (16, 2, 4), (5, 8, 4)]:
        covered = []
        for pi in range(pc):
            s, e = host_segment(n, pi, pc, batch=batch)
            assert 0 <= s <= e <= n
            if e > s and e < n:
                assert (e - s) % batch == 0
            covered.extend(range(s, e))
        assert covered == list(range(n)), (n, pc, batch)


def test_host_batches_only_yields_own_segment():
    n, h, w = 11, 8, 12
    frames = (np.arange(n)[:, None, None]
              * np.ones((h, 2 * w))).astype(np.uint8)
    seen = []
    for pi in range(3):
        src = VideoSource(frames, gray=False)
        for idxs, lefts, rights in host_batches(
                src, 2, process_index=pi, process_count=3):
            for k, fi in enumerate(idxs):
                if fi < 0:
                    continue
                assert lefts[k].shape == (h, w)
                assert float(lefts[k][0, 0]) == float(fi)
                seen.append(int(fi))
    assert sorted(seen) == list(range(n))


def test_host_batches_cursor_resume():
    """At-least-once resume: the cursor advances when the generator
    resumes past a batch (same convention as VideoSource.batches), so a
    job killed mid-batch re-processes that batch — idempotent per-frame
    outputs make this safe (SURVEY.md §5 checkpoint/resume)."""
    n = 8
    frames = (np.arange(n)[:, None, None]
              * np.ones((4, 8))).astype(np.uint8)
    from stereo_depth_ruler_tpu.io.video import FrameCursor
    cur = FrameCursor(source="<array>")
    it = host_batches(VideoSource(frames, gray=False), 2,
                      process_index=0, process_count=1, cursor=cur)
    next(it)          # batch [0, 1]
    next(it)          # batch [2, 3]; resuming past batch 1 set cursor=2
    it.close()
    assert cur.next_frame == 2
    got = []
    it2 = host_batches(VideoSource(frames, gray=False), 2,
                       process_index=0, process_count=1, cursor=cur)
    for idxs, _, _ in it2:
        got.extend(int(i) for i in idxs if i >= 0)
    assert got == list(range(2, n))   # batch [2,3] replayed, none lost


def test_initialize_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("SDR_COORDINATOR", raising=False)
    monkeypatch.delenv("SDR_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False


def test_make_global_mesh_shapes():
    mesh = make_global_mesh(tile=2, disp=2)      # 8 CPU devices -> frame=2
    assert mesh.shape["frame"] == 2
    assert mesh.shape["tile"] == 2
    assert mesh.shape["disp"] == 2
    with pytest.raises(ValueError):
        make_global_mesh(tile=3, disp=1)         # 8 % 3 != 0


def test_replan_segments_covers_unfinished_exactly_once():
    """Host-failure re-shard (SURVEY §5 recovery): every unfinished frame
    lands on exactly one survivor; finished frames are never redone."""
    from stereo_depth_ruler_tpu.io.video import host_segment, replan_segments

    n_frames, n_hosts, batch = 103, 4, 4
    # host 1 died mid-way, host 3 died before checkpointing
    cursors = {}
    for h in range(n_hosts):
        s, e = host_segment(n_frames, h, n_hosts, batch=batch)
        cursors[h] = {0: e, 1: s + 9, 2: s + 4, 3: s}[h]
    plan = replan_segments(n_frames, cursors, surviving=[0, 2], batch=batch)

    covered = []
    for h, intervals in plan.items():
        for a, b in intervals:
            covered.extend(range(a, b))
    expected = []
    for h in range(n_hosts):
        s, e = host_segment(n_frames, h, n_hosts, batch=batch)
        expected.extend(range(min(max(cursors[h], s), e), e))
    assert sorted(covered) == sorted(expected)
    assert len(covered) == len(set(covered))
    # determinism: every survivor computes the identical plan
    assert plan == replan_segments(n_frames, cursors, surviving=[2, 0],
                                   batch=batch)


def test_recovered_batches_processes_plan(tmp_path):
    from stereo_depth_ruler_tpu.io.video import (FrameCursor,
                                                 recovered_batches,
                                                 replan_segments)

    n_frames = 24
    frames = np.stack([np.full((8, 16), i, np.uint8)
                       for i in range(n_frames)])
    src = VideoSource(frames, gray=False)
    cursors = {0: 8, 1: 14}          # host 1 (segment [12,24)) died at 14
    plan = replan_segments(n_frames, cursors, surviving=[0], batch=2)
    cur = FrameCursor(source="x")
    seen = []
    for idxs, lefts, rights in recovered_batches(src, 2, plan[0],
                                                 cursor=cur):
        seen.extend(int(i) for i in idxs if i >= 0)
    assert seen == list(range(8, 12)) + list(range(14, 24))
    assert cur.next_frame == 24


def test_recovered_batches_inherited_earlier_interval(tmp_path):
    """r4 advisor (high): a survivor whose OWN segment follows a dead
    host's segment inherits an interval that starts BELOW its cursor
    position after its own work — the monotone cursor must not skip it.
    Here host 0 (segment [0,12)) dies at frame 2; survivor 1 (segment
    [12,24), cursor 14) must process [14,24) AND the orphaned [2,12)."""
    from stereo_depth_ruler_tpu.io.video import (FrameCursor,
                                                 recovered_batches,
                                                 replan_segments)

    n_frames = 24
    frames = np.stack([np.full((8, 16), i, np.uint8)
                       for i in range(n_frames)])
    src = VideoSource(frames, gray=False)
    cursors = {0: 2, 1: 14}
    plan = replan_segments(n_frames, cursors, surviving=[1], batch=2)
    assert plan[1] == sorted(plan[1])      # ascending for the cursor
    cur = FrameCursor(source="x")
    seen = []
    for idxs, lefts, rights in recovered_batches(src, 2, plan[1],
                                                 cursor=cur):
        seen.extend(int(i) for i in idxs if i >= 0)
    assert sorted(seen) == list(range(2, 12)) + list(range(14, 24))
    assert len(seen) == len(set(seen))
