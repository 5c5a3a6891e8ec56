"""Network render node — the ``mtssrv`` analog
(``/root/reference/src/mitsuba/mtssrv.cpp:465`` accept loop; ``-ls`` stdin
mode at ``mtssrv.cpp:203`` for SSH tunnelling).

Usage:
    python -m mitsuba_im_tpu.cli.mtssrv [-p PORT] [-i HOST] [-q]
    python -m mitsuba_im_tpu.cli.mtssrv -ls        # serve over stdin/stdout
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mtssrv-tpu", description=__doc__)
    ap.add_argument("-p", dest="port", type=int, default=None,
                    help="listen port (default 7554)")
    ap.add_argument("-i", dest="host", default="",
                    help="interface to bind (default: all)")
    ap.add_argument("-ls", dest="stdio", action="store_true",
                    help="serve a single connection over stdin/stdout")
    ap.add_argument("-q", dest="quiet", action="store_true")
    args = ap.parse_args(argv)

    from ..parallel import remote

    log = (lambda *_: None) if args.quiet else (
        lambda *a: print("[mtssrv]", *a, file=sys.stderr, flush=True))
    if args.stdio:
        remote.serve_stdio(log=log)
    else:
        remote.serve_tcp(port=args.port or remote.DEFAULT_PORT,
                         host=args.host, log=log)
    return 0


if __name__ == "__main__":
    sys.exit(main())
