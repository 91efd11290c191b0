"""Run pytest on a worker thread with a huge PRE-RESERVED fixed stack.

Why this exists (the full story, continued from conftest.py): XLA:CPU's
native compile passes recurse deeply on the fused whole-pipeline
programs. Raising RLIMIT_STACK to unlimited and re-exec'ing (the round-2
fix) makes the MAIN thread's stack growable — but a growing main stack
must expand downward into unreserved address space, and after ~150 tests
the process has mmap'd enough (executables, weakref caches, allocator
arenas) that a mapping eventually sits in the growth path: the next deep
compile SIGSEGVs on first touch beyond it, regardless of the rlimit
(reproduced: full-suite runs died at ~84% inside
backend_compile_and_load with RLIMIT_STACK verified (-1, -1)).

A thread created after ``threading.stack_size(1 << 30)`` gets ONE
contiguous 1 GB mapping reserved up front — nothing can ever be placed
inside it, so depth is bounded by the reservation alone, deterministic
for the whole session. Virtual reservation only: pages commit lazily, so
real memory use is unchanged.

conftest.py execs this wrapper (once) in place of `python -m pytest`.
"""

import os
import sys
import threading

# `python -m pytest` puts the CWD at sys.path[0]; exec'ing this file puts
# tests/ there instead, which would hide the repo package. Mirror the
# original semantics.
if sys.path and sys.path[0] == os.path.dirname(os.path.abspath(__file__)):
    sys.path[0] = os.getcwd()


def main(argv) -> int:
    threading.stack_size(1 << 30)  # 1 GB reserved, lazily committed
    rc = []

    def run():
        import pytest

        rc.append(pytest.main(argv))

    t = threading.Thread(target=run, name="pytest-bigstack")
    t.start()
    t.join()
    return int(rc[0]) if rc else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
