from .vocabulary import Vocabulary, train_vocabulary, transform, bow_vectors, score_l1  # noqa: F401
from .database import KeyFrameDatabase  # noqa: F401
