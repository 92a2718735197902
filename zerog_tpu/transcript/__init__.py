from .keccak import keccak256
from .transcript import (
    KeccakTranscriptWriter, KeccakTranscriptReader,
    Blake2bTranscriptWriter, Blake2bTranscriptReader,
)

__all__ = [
    "keccak256",
    "KeccakTranscriptWriter", "KeccakTranscriptReader",
    "Blake2bTranscriptWriter", "Blake2bTranscriptReader",
]
