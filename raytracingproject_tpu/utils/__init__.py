"""Foundation utilities (ref: intern/cycles/util/)."""
