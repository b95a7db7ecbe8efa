from . import molecule, protein, fg  # noqa: F401
