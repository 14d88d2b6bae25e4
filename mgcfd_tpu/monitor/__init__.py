from .csvout import CsvIdentification, write_times_csv, write_loop_stats_csv
from .instrument import InstrumentedSolver, KernelStats
from .instrument_sharded import InstrumentedShardedSolver

__all__ = ["CsvIdentification", "write_times_csv", "write_loop_stats_csv",
           "InstrumentedSolver", "KernelStats",
           "InstrumentedShardedSolver"]
