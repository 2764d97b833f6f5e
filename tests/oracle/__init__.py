"""Parity-oracle shim: the sequential reference engine lives in the package
(toyspice_tpu.hostsim) so it doubles as the host simulation backend; tests
keep importing it from here."""

from toyspice_tpu.hostsim.engine import (
    OracleCircuit,
    oracle_op,
    oracle_tran,
    oracle_dc,
    oracle_ac,
)

__all__ = ["OracleCircuit", "oracle_op", "oracle_tran", "oracle_dc", "oracle_ac"]
