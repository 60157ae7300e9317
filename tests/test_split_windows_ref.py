"""split_windows vs the reference's split_batch, re-implemented as an oracle.

VERDICT r1 #4 flagged the final-window semantics as a possible deviation
("the reference yields a shorter final window"). It does not: reference
``split_batch`` (insv2v_run_loveu_tgve.py:12-29) sets
``this_ref_frames = frames_in_batch - remaining`` when the remainder is
short, and the run loop (:140-161) prepends that many trailing frames of
the previous window — i.e. the final window is ALSO padded to the full
``frames_in_batch`` length with extra ref frames, exactly what
``split_windows`` encodes as one fixed jit-once shape. This test pins the
equivalence for every reachable (total, window, ref) combination.
"""

from insv2v_tpu.diffusion.samplers import split_windows


def _reference_split_batch(total, frames_in_batch=16, num_ref_frames=4):
    """Faithful re-implementation of insv2v_run_loveu_tgve.py:12-29 plus
    the window assembly at :139-141 (cond_ = prev[-ref:] ++ new)."""
    new_spans = [(0, min(frames_in_batch, total))]
    ptr = new_spans[0][1]
    refs = []
    while ptr < total:
        remaining = total - ptr
        if remaining < frames_in_batch:
            n_new = remaining
        else:
            n_new = frames_in_batch - num_ref_frames
        refs.append(frames_in_batch - n_new)
        new_spans.append((ptr, ptr + n_new))
        ptr += n_new
    # window k>0 covers [start_new - ref, end_new): the run loop prepends
    # the previous window's last `ref` frames
    windows = [(new_spans[0][0], new_spans[0][1] - new_spans[0][0], 0)]
    for (s, e), r in zip(new_spans[1:], refs):
        windows.append((s - r, e - (s - r), r))
    return windows


def test_split_windows_matches_reference_exhaustive():
    for total in range(1, 130):
        for window in (8, 16):
            for ref in (2, 4):
                ours = [(w.start, w.num_frames, w.num_ref)
                        for w in split_windows(total, window, ref)]
                theirs = _reference_split_batch(total, window, ref)
                assert ours == theirs, (total, window, ref, ours, theirs)


def test_headline_case_covers_all_frames_once():
    # 32 frames, 16-window, 4 refs: the benchmark shape
    ws = split_windows(32, 16, 4)
    assert [(w.start, w.num_frames, w.num_ref) for w in ws] == [
        (0, 16, 0), (12, 16, 4), (16, 16, 12)]
    covered = []
    for w in ws:
        covered.extend(range(w.start + w.num_ref, w.start + w.num_frames))
    # every frame is produced as a "new" frame exactly once
    assert covered == list(range(32)) and ws[0].num_frames == 16
