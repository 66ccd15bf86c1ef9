"""ministark_tpu: a TPU-native STARK prover/verifier framework (JAX/Pallas).

Built from scratch with the capabilities of andrewmilson/ministark (see
SURVEY.md at the repo root for the structural map of the reference).
"""

__version__ = "0.1.0"
