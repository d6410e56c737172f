#!/usr/bin/env python
"""Entry-point shim matching the reference invocation `python main.py ...`
(reference main.py:322-342); all behavior lives in asyrp_official_tpu.cli.
"""
import os
import sys

from asyrp_official_tpu.cli.main import main

if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)  # skip the axon TPU backend's slow teardown (CLAUDE.md)
