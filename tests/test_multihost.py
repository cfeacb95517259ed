"""Multi-host chunk assignment logic (topology faked; real DCN runs are
out of scope for single-host CI)."""

from flutpu.parallel.multihost import ChunkAssignment, stitch_order


def test_local_chunks_partition():
    hosts = [ChunkAssignment(p, 4, 16) for p in range(4)]
    all_chunks = [c for h in hosts for c in h.local_chunks()]
    assert sorted(all_chunks) == list(range(16))
    assert hosts[2].local_chunks() == [8, 9, 10, 11]


def test_owner_of():
    a = ChunkAssignment(0, 4, 16)
    assert a.owner_of(0) == 0
    assert a.owner_of(5) == 1
    assert a.owner_of(15) == 3


def test_stitch_order():
    pieces = [(2, b"C"), (0, b"A"), (1, b"B")]
    assert stitch_order(pieces) == b"ABC"
