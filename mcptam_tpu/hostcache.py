"""Host-fingerprinted persistent XLA:CPU compile cache.

/root is a volume that moves between machines; XLA:CPU loading an AOT
cache entry compiled for another machine's CPU feature set can SIGILL
("+prefer-no-gather is not supported on the host machine", then a hard
crash mid-suite).  Key the cache directory by a sha1 of the host's
/proc/cpuinfo flags so every machine class gets its own cache.  Used by
tests/conftest.py, __graft_entry__.py and the subprocess drive scripts —
one implementation so the fingerprint can never drift between them.
"""

from __future__ import annotations

import hashlib


_KEYS = ("vendor_id", "cpu family", "model", "stepping", "model name",
         "flags")


def cpu_cache_dir(prefix: str = "/root/.jax_cache_cpu_tests_") -> str:
    # the fingerprint must include the MODEL identity, not just the flags
    # line: XLA derives tuning pseudo-features like +prefer-no-gather from
    # the detected microarchitecture, so two machines with identical flag
    # sets can still produce mutually-SIGILLing AOT entries (observed:
    # "+prefer-no-gather is not supported on the host machine" from a
    # flags-keyed cache)
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not ln.strip():
                    break   # processor 0 block only
                if ln.split(":")[0].strip() in _KEYS:
                    ident.append(ln.strip())
    except OSError:
        pass
    if not ident:
        # /proc/cpuinfo unreadable: a constant hash would merge every such
        # host into ONE cache dir — exactly the cross-machine SIGILL this
        # module exists to prevent.  Fall back to whatever identity python
        # exposes (may still collide, but only across same-reported-arch
        # hosts rather than across everything).
        import platform
        ident = [platform.machine(), platform.processor(),
                 platform.platform()]
    return prefix + hashlib.sha1("\n".join(ident).encode()).hexdigest()[:12]


def enable_cpu_cache(jax_module) -> str:
    """Point jax's persistent compilation cache at the host-keyed
    directory; returns the directory used."""
    d = cpu_cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             0.5)
    return d
