from .search import autotune, TuneResult, Measurement, Memo, TILE_PALETTE
from .genetic import GeneticTuner, Genome
