"""flutpu-inspect — element discovery (gst-inspect analog).

    python -m flutpu.inspect              # list all factories
    python -m flutpu.inspect tpujpegenc   # details: pads, caps, properties
"""

from __future__ import annotations

import sys

from .core import factories, make
from .core.pad import PadDirection


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    regs = factories()
    if not args:
        for name in sorted(regs):
            cls = regs[name]
            doc = (cls.__doc__ or "").strip().splitlines()
            summary = doc[0] if doc else ""
            print(f"{name:24s} {summary[:70]}")
        return 0

    name = args[0]
    if name not in regs:
        print(f"no such element factory {name!r}", file=sys.stderr)
        return 1
    cls = regs[name]
    print(f"Factory: {name}")
    print(f"Class:   {cls.__module__}.{cls.__name__}")
    if cls.__doc__:
        print("\n" + cls.__doc__.strip() + "\n")
    try:
        el = cls()
    except Exception as e:
        print(f"(cannot instantiate for pad listing: {e})")
        el = None
    if el is not None:
        print("Pads:")
        for pad in el.pads.values():
            caps = pad.template_caps
            desc = "ANY" if caps.is_any else repr(caps)
            print(f"  {pad.direction.value:5s} {pad.name:12s} {desc}")
        if el.request_pad.__qualname__ != "Element.request_pad":
            print("  (has request pads)")
    specs = cls._all_prop_specs()
    if specs:
        print("Properties:")
        for spec in specs:
            flags = " [construct-only]" if spec.construct_only else ""
            print(f"  {spec.name:24s} default={spec.default!r}{flags}"
                  f"{'  ' + spec.doc if spec.doc else ''}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
