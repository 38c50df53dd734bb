"""Fleet: vehicle container + interconnection graph.

Mirrors /root/reference/omgtools/vehicles/fleet.py: neighbor topology
('circular' or 'full'), formation configuration -> per-vehicle relative
positions ``rel_pos_c`` and pairwise relative configurations ``rel_config``,
and broadcasting of initial/terminal conditions.

The neighbor graph is what the distributed ADMM / dual-decomposition layers
communicate along; on a TPU mesh the circular default maps directly onto a
ring of devices (ppermute neighbors).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

__all__ = ["Fleet", "get_fleet_vehicles"]


class Fleet:

    def __init__(self, vehicles=None, interconnection="circular"):
        vehicles = vehicles or []
        self.vehicles = vehicles if isinstance(vehicles, list) else [vehicles]
        self.interconnection = interconnection
        self.set_neighbors()

    @property
    def N(self):
        return len(self.vehicles)

    def add_vehicle(self, vehicle):
        if isinstance(vehicle, list):
            self.vehicles.extend(vehicle)
        else:
            self.vehicles.append(vehicle)
        self.set_neighbors()

    def set_neighbors(self):
        """Build the neighbor lists (reference fleet.py:49-60)."""
        self.nghb_list: Dict = {}
        N = self.N
        for l, vehicle in enumerate(self.vehicles):
            if self.interconnection == "circular":
                if N > 2:
                    nghb_ind = [(l + 1) % N, (l - 1) % N]
                elif N == 2:
                    nghb_ind = [(l + 1) % N]
                else:
                    nghb_ind = []
            elif self.interconnection == "full":
                nghb_ind = [k for k in range(N) if k != l]
            else:
                raise ValueError("interconnection must be circular or full")
            self.nghb_list[vehicle] = [self.vehicles[k] for k in nghb_ind]

    def get_neighbors(self, vehicle):
        return self.nghb_list[vehicle]

    # -- formation configuration ------------------------------------------
    def set_configuration(self, configuration):
        """configuration: list of per-vehicle relative positions (in the
        fleet-center frame); builds rel_pos_c per vehicle and pairwise
        rel_config (reference fleet.py:62-101)."""
        self.configuration = {
            veh: np.asarray(configuration[l], dtype=np.float64)
            for l, veh in enumerate(self.vehicles)}
        centroid = np.mean([self.configuration[v] for v in self.vehicles],
                           axis=0)
        self.rel_config = {}
        for veh in self.vehicles:
            self.rel_config[veh] = {}
            for nghb in self.get_neighbors(veh):
                self.rel_config[veh][nghb] = (self.configuration[veh]
                                              - self.configuration[nghb])
            # relative position wrt the fleet center
            veh.rel_pos_c = self.configuration[veh] - centroid

    def get_rel_config(self, vehicle):
        return self.rel_config[vehicle]

    # -- broadcast helpers -------------------------------------------------
    def set_initial_conditions(self, conditions):
        for veh, cond in zip(self.vehicles, conditions):
            veh.set_initial_conditions(cond)

    def set_terminal_conditions(self, conditions):
        for veh, cond in zip(self.vehicles, conditions):
            veh.set_terminal_conditions(cond)

    def overrule_state(self, states):
        for veh, st in zip(self.vehicles, states):
            veh.overrule_state(st)

    def overrule_input(self, inputs):
        for veh, inp in zip(self.vehicles, inputs):
            veh.overrule_input(inp)


def get_fleet_vehicles(fleet_or_vehicles):
    """Normalize user input to (Fleet, [vehicles])
    (reference fleet.py:176-185)."""
    from .base import Vehicle
    if isinstance(fleet_or_vehicles, Fleet):
        return fleet_or_vehicles, fleet_or_vehicles.vehicles
    if isinstance(fleet_or_vehicles, Vehicle):
        fleet = Fleet([fleet_or_vehicles])
        return fleet, fleet.vehicles
    fleet = Fleet(list(fleet_or_vehicles))
    return fleet, fleet.vehicles
