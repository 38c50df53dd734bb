"""Formation export stub (reference export_formation.py analog).

The distributed two-phase C++ update API (ADMMPoint2Point::update1/update2)
is planned for a later round; the single-vehicle runtime in export.py is
functional today.
"""


class ExportFormation:
    def __init__(self, problem, options=None):
        raise NotImplementedError(
            "formation export lands in a later round; see export/export.py "
            "for the single-vehicle embedded runtime")
