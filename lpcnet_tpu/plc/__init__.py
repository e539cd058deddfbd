"""Packet loss concealment: core vocoder state, PLC state machine, driver,
and the fully-batched mixed-loss variant (batched.BatchedPLC)."""

from . import batched, core, driver, plc  # noqa: F401
