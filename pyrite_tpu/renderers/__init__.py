"""Rendering algorithms: simple (camera path + NEE), bidirectional, photon."""
