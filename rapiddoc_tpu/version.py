__version__ = "0.1.0"
# Capability target: RapidAI/RapidDoc 0.9.8 (reference: rapid_doc/version.py)
__capability_version__ = "0.9.8"
