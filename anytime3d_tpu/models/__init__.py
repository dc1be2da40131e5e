"""Model layer: one configurable MultiModalVAE replaces the reference's seven
copy-pasted nolbo.py classes; DetectorReconstructor replaces nolbo_test.py;
Classifier replaces classifier.py. Variant table: SURVEY.md §2.3.
"""

from anytime3d_tpu.models.mmvae import MultiModalVAE, MMVAEConfig, EncoderOutput
from anytime3d_tpu.models.classifier import Classifier, ClassifierConfig
from anytime3d_tpu.models.detector import DetectorReconstructor, DetectorConfig
from anytime3d_tpu.models import configs

__all__ = [
    "MultiModalVAE",
    "MMVAEConfig",
    "EncoderOutput",
    "Classifier",
    "ClassifierConfig",
    "DetectorReconstructor",
    "DetectorConfig",
    "configs",
]
