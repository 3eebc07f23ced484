"""Persistent compile-cache policy.

Two failure modes were observed (round 3) with a persistent JAX
compilation cache on the CPU platform:

1. **Cross-host poison.** XLA:CPU AOT executables embed the compiling
   host's CPU features (avx512/amx/``prefer-no-scatter`` …) without
   keying on them; ``/root`` persists across sessions while the machine
   rotates, so a shared dir handed this host another host's machine code
   (``cpu_aot_loader.cc`` feature-mismatch errors → SIGSEGV mid-suite).
2. **Same-host reload crash.** Even entries written by THIS host
   segfault on reload for the 8-virtual-device shard_map programs
   (reproduced 2/2 on ``test_cli_walkers_times_spatial``: cold compile
   passes, warm reload segfaults in the jitted executable) — an XLA:CPU
   AOT round-trip bug for multi-device executables.

Policy: the persistent cache is **disabled on the CPU platform** (the
test suite and the multichip dry run recompile fresh — they are
trace-bound, not compile-bound) and **enabled on the shared legacy dir
for TPU runs**, where executables target the chip, not the host CPU,
and reloads are safe and worth minutes of compile time.  A TPU-platform
process never looks up CPU-backend keys, so the legacy dir's old CPU
entries are unreachable poison, not a hazard.
"""
import os


def _selected_platform() -> str:
    """First entry of the effective jax_platforms selection ('' unknown)."""
    plats = ""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip().lower()


def enable_persistent_cache(min_compile_secs: float = 2.0):
    """Apply the cache policy for the currently-selected platform.

    ``METADYN_JAX_CACHE`` (the documented override, docs/guide.md) is
    used verbatim when set — on any platform.  Safe to call again after
    re-pinning ``jax_platforms`` (e.g. the dry run pinning cpu): the
    choice is re-evaluated before any compile happens.

    Returns the cache dir, or None when the cache is disabled.
    """
    import jax

    path = os.environ.get("METADYN_JAX_CACHE")
    if path is None and _selected_platform() != "cpu":
        path = "/root/.jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return path
