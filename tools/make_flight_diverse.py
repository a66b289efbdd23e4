"""Generate a DIVERSE synthetic flight-imitation dataset.

Round-5 root cause of the controller-reuse failures (rounds 4 and 5
first try): the flight LL was trained on the single straight-line
synthetic trajectory (envs/trajectories.py inference_flight_store), so
its steering observables (ref_displacement / ref_root_quat) were
near-constant for 52M env steps. Any nonzero HL steering is then
out-of-distribution: the frozen LL's state-dependent stddev explodes
(pi_stddev_max 0.63 -> 1.96, kl_stddev_rel 41 in the round-5 HL run)
and HL training lands BELOW the no-op baseline.

The reference trains its LL on real mocap flight trajectories with
turns and climbs (figshare, unavailable here:
/root/reference/flybody/tasks/trajectory_loaders.py:67-141). This tool
writes the equivalent diversity synthetically in the same HDF5 schema
(trajectories/<idx>/com_qpos, com_qvel): a grid of speeds x yaw rates
x climb rates.

Usage: python -m tools.make_flight_diverse [out.h5]
"""
import sys

import numpy as np

from flybody_tpu.envs.trajectories import constant_speed_trajectory

SPEEDS = (15.0, 20.0, 25.0)          # cm/s
YAWS = (-4.0, -2.0, 0.0, 2.0, 4.0)   # rad/s
CLIMBS = (-6.0, 0.0, 6.0)            # cm/s vertical drift
N_STEPS = 200
DT = 2e-4                            # flight control timestep


def main(out='datasets/flight_diverse.h5'):
    import h5py
    trajs = []
    for speed in SPEEDS:
        for yaw in YAWS:
            for vz in CLIMBS:
                com_qpos, com_qvel = constant_speed_trajectory(
                    n_steps=N_STEPS, speed=speed, yaw_speed=yaw,
                    init_pos=(0.0, 0.0, 1.0), body_rot_angle_y=-47.5,
                    control_timestep=DT)
                t = np.arange(N_STEPS) * DT
                com_qpos = com_qpos.copy()
                com_qpos[:, 2] += vz * t
                com_qvel = com_qvel.copy()
                com_qvel[:, 2] = vz
                trajs.append((com_qpos, com_qvel))
    nz = len(str(len(trajs)))
    with h5py.File(out, 'w') as f:
        g = f.create_group('trajectories')
        for i, (qp, qv) in enumerate(trajs):
            gi = g.create_group(str(i).zfill(nz))
            gi.create_dataset('com_qpos', data=qp)
            gi.create_dataset('com_qvel', data=qv)
    print(f'wrote {len(trajs)} trajectories x {N_STEPS} steps to {out}')


if __name__ == '__main__':
    main(*sys.argv[1:])
