"""Model zoo: Flax counterparts of the reference's classifier and
synthesis architectures, plus the signature-filtered factory."""

from .deep import CNNClassifier, CNNRNNClassifier  # noqa: F401
from .factory import get_classifier_by_name, resolve_model_class  # noqa: F401
from .simple import LogisticRegressionClassifier, ShallowNNClassifier  # noqa: F401
from .synthesis import SynthesisLite, SynthesisModelCNN  # noqa: F401
