"""Sources: synthetic fixture generator, MDS payload reader, registry."""
