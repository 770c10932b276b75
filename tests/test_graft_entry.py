"""The driver entry points must work in any environment.

Round-1 regression: ``dryrun_multichip`` assumed enough devices already
existed; on the axon platform (1 real chip) the mesh came up size-1 and the
driver's MULTICHIP check failed.  It now self-provisions a virtual CPU mesh
by re-exec'ing into a child process (VERDICT.md round-1 item #1).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_inprocess():
    """With >= n devices available (the 8-device test mesh), the dry run
    executes in-process."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_reexecs_when_short_of_devices():
    """Asking for more devices than the parent has must re-exec a child with
    a forced virtual CPU mesh rather than assert-failing (the round-1 driver
    failure mode)."""
    import __graft_entry__ as g

    g.dryrun_multichip(16)
