"""Packet loss concealment: core vocoder state, PLC state machine, driver."""

from . import core, driver, plc  # noqa: F401
