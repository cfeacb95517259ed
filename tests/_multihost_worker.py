"""Worker process for the two-process jax.distributed smoke test.

Each process bootstraps into a 2-process CPU "cluster" (4 virtual devices
per host), computes the chunk assignment its process owns, encodes those
chunks independently, and prints (chunk_index, payload-hex) lines — the
DCN gather is the parent test collecting stdout (nothing else crosses
hosts, per the SURVEY §5.8 zero-collective encode contract).

Usage: python _multihost_worker.py <coordinator> <num_processes> <pid>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, num_processes, pid = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flutpu.parallel import multihost

    multihost.initialize(coordinator=coordinator,
                         num_processes=num_processes, process_id=pid)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.process_index() == pid
    assert jax.device_count() == 4 * num_processes  # global across hosts
    assert jax.local_device_count() == 4

    import numpy as np
    from flutpu.codec.fvc import FvcEncoder

    rng = np.random.default_rng(7)  # same batch on every host
    frames = rng.integers(0, 256, (8, 2, 32, 32, 3), np.uint8)

    a = multihost.assignment(chunks_per_batch=8)
    enc = FvcEncoder(quality=85)
    for ci in a.local_chunks():
        payload = enc.encode_chunk(frames[ci])
        print(f"CHUNK {ci} {payload.hex()}", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
