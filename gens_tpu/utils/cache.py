"""Per-user persistent XLA compilation-cache location.

The cache was previously the fixed world-writable path
``/tmp/gens_tpu_jax_cache`` — on a shared machine another user could
pre-create/poison it (the cache holds deserialized executables) or cause
permission failures (ADVICE r04). Every harness now resolves the directory
through :func:`compile_cache_dir`, which is per-uid and created 0700.

On first use, entries from the legacy path are hard-linked in (only when
both the directory and each file are owned by the current uid) so existing
warm caches — worth ~2 min per large program through the tunneled remote
compiler — survive the move.
"""

import os
import shutil
import tempfile

def compile_cache_dir(suffix: str = "") -> str:
    uid = os.getuid()
    tmp = tempfile.gettempdir()
    legacy = os.path.join(tmp, "gens_tpu_jax_cache" + suffix)
    d = os.path.join(tmp, f"gens_tpu_jax_cache{suffix}_{uid}")
    if not os.path.isdir(d):
        os.makedirs(d, mode=0o700, exist_ok=True)
        try:
            if os.stat(legacy).st_uid == uid:
                for name in os.listdir(legacy):
                    src = os.path.join(legacy, name)
                    dst = os.path.join(d, name)
                    if (os.path.isfile(src) and not os.path.exists(dst)
                            and os.stat(src).st_uid == uid):
                        try:
                            os.link(src, dst)
                        except OSError:
                            shutil.copy2(src, dst)
        except OSError:
            pass
    return d


def enable_compile_cache(jax_module, min_compile_secs: float = 2.0) -> str:
    """Point jax at the per-user cache (the one-liner every script needs)."""
    d = compile_cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
    return d
