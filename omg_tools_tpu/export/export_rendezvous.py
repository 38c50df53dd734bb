"""Rendezvous export stub (reference export_rendezvous.py analog)."""


class ExportRendezVous:
    def __init__(self, problem, options=None):
        raise NotImplementedError(
            "rendezvous export lands in a later round; see export/export.py "
            "for the single-vehicle embedded runtime")
