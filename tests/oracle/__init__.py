from .engine import OracleCircuit, oracle_op, oracle_tran, oracle_dc, oracle_ac

__all__ = ["OracleCircuit", "oracle_op", "oracle_tran", "oracle_dc", "oracle_ac"]
