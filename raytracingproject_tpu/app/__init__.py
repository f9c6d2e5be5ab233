"""Front ends: example scenes, XML scene format, CLI (ref: intern/cycles/app/)."""
