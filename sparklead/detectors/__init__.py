from sparklead.detectors.rarity import rarity_fit, rarity_score
from sparklead.detectors.oov import oov_score
from sparklead.detectors.nep import NGramModel, nep_enhance
from sparklead.detectors.logdistance import term_vector, log_distances

__all__ = [
    "NGramModel",
    "log_distances",
    "nep_enhance",
    "oov_score",
    "rarity_fit",
    "rarity_score",
    "term_vector",
]
