"""Fingerprint every component of the JAX persistent-compile-cache key.

The axon TPU tunnel occasionally re-keys the entire compile cache across
server swaps (observed between rounds: the shipped ``.jax_cache`` seed
missed and the bench path recompiled ~54 executables).  The build stamp in
``platform_version`` was one volatile component (sanitized in
``mlff_tpu.__init__._stabilize_cache_key``); this tool captures ALL
components of a real cache-key computation so the next generation flip can
be diffed byte-for-byte:

    python tools/dump_cache_key.py            # print component hashes
    python tools/dump_cache_key.py --save X   # also write X.json + X.pb

Diff two saved fingerprints with:

    python tools/dump_cache_key.py --diff A.json B.json
"""

import argparse
import base64
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")


def _component_hashes(module, devices, compile_options, backend):
    """Recompute each cache-key component hash separately (mirrors the entry
    list in jax._src.cache_key.get)."""
    from jax._src import cache_key as ck
    from jax._src.lib import version_str as jaxlib_version_str

    comps = {}

    def one(name, fn):
        h = hashlib.sha256()
        fn(h)
        comps[name] = h.digest().hex()

    one("computation", lambda h: ck._hash_computation(
        h, module, ck.IgnoreCallbacks.NO))
    one("jaxlib_version", lambda h: h.update(
        jaxlib_version_str.encode("utf-8")))
    one("backend_version", lambda h: ck._hash_platform(h, backend))
    one("xla_flags", lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes()))
    one("compile_options", lambda h: ck._hash_serialized_compile_options(
        h, compile_options,
        strip_device_assignment=(backend.platform == "gpu")))
    one("accelerator_config", lambda h: ck._hash_accelerator_config(h, devices))
    one("custom_hook", lambda h: ck._hash_string(h, ck.custom_hook()))
    return comps


def capture(save: str | None = None):
    import jax  # noqa: deferred so --diff works without a backend
    import jax.numpy as jnp
    import mlff_tpu  # noqa: F401  (applies the key stabilization patch)
    from jax._src import cache_key as ck

    captured = {}
    orig_get = ck.get

    def spy(module, devices, compile_options, backend, *a, **kw):
        if not captured:
            captured.update(
                module=module, devices=devices,
                compile_options=compile_options, backend=backend)
        return orig_get(module, devices, compile_options, backend, *a, **kw)

    ck.get = spy
    try:
        jax.jit(lambda x: jnp.sin(x) @ x.T)(
            jnp.ones((8, 8), jnp.float64)).block_until_ready()
    finally:
        ck.get = orig_get
    if not captured:
        print("cache key was never computed — is the persistent cache on?",
              file=sys.stderr)
        sys.exit(1)

    backend = captured["backend"]
    comps = _component_hashes(
        captured["module"], captured["devices"],
        captured["compile_options"], backend)

    # raw (cleared-debug-options) serialized compile options for byte diffs
    import copy
    co = copy.deepcopy(captured["compile_options"])
    co.executable_build_options.debug_options.xla_dump_to = ""
    raw = co.SerializeAsString()

    out = {
        "platform": backend.platform,
        "platform_version": backend.platform_version,
        "device_kinds": [d.device_kind for d in captured["devices"].flat],
        "device_ids": [getattr(d, "id", None) for d in captured["devices"].flat],
        "component_hashes": comps,
        "compile_options_b64": base64.b64encode(raw).decode(),
    }
    print(json.dumps({k: v for k, v in out.items()
                      if k != "compile_options_b64"}, indent=2))
    if save:
        with open(save + ".json", "w") as f:
            json.dump(out, f, indent=2)
        with open(save + ".pb", "wb") as f:
            f.write(raw)
        print(f"saved {save}.json / {save}.pb", file=sys.stderr)
    return out


def diff(a_path: str, b_path: str):
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)
    same = True
    for k in a["component_hashes"]:
        ha, hb = a["component_hashes"][k], b["component_hashes"].get(k)
        if ha != hb:
            same = False
            print(f"DIFFERS: {k}\n  {ha}\n  {hb}")
    if a.get("platform_version") != b.get("platform_version"):
        print("platform_version:")
        print("  A:", a.get("platform_version").replace("\n", " | "))
        print("  B:", b.get("platform_version").replace("\n", " | "))
    ra = base64.b64decode(a.get("compile_options_b64", ""))
    rb = base64.b64decode(b.get("compile_options_b64", ""))
    if ra != rb:
        same = False
        print(f"compile_options bytes differ ({len(ra)} vs {len(rb)} bytes)")
        n = min(len(ra), len(rb))
        for i in range(n):
            if ra[i] != rb[i]:
                print(f"  first differing byte at offset {i}: "
                      f"{ra[max(0,i-8):i+8].hex()} vs {rb[max(0,i-8):i+8].hex()}")
                break
    print("IDENTICAL" if same else "(see differences above)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--save", default=None, help="basename to save .json/.pb")
    p.add_argument("--diff", nargs=2, default=None,
                   metavar=("A.json", "B.json"))
    args = p.parse_args()
    if args.diff:
        diff(*args.diff)
    else:
        capture(args.save)
