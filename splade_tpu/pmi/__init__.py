from splade_tpu.pmi.cooccurrence import CooccurrenceBuilder, CooccurrenceMatrix
from splade_tpu.pmi.pmi_calculator import PMICalculator, PPMICalculator, compute_npmi
from splade_tpu.pmi.synonym_validator import SynonymValidator, ValidationResult

__all__ = [
    "CooccurrenceBuilder",
    "CooccurrenceMatrix",
    "PMICalculator",
    "PPMICalculator",
    "compute_npmi",
    "SynonymValidator",
    "ValidationResult",
]
