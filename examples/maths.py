"""Math-types demo: Vec3/Quat/Transform algebra + numpy dtype bridge.

Counterpart of /root/reference/examples/maths.py.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

example_args("math types")

v1 = gymapi.Vec3(1, 2, 3)
v2 = gymapi.Vec3(4, 5, 6)
print("v1 + v2 =", v1 + v2)
print("v1 - v2 =", v1 - v2)
print("dot =", v1.dot(v2), " cross =", v1.cross(v2))
print("length(3,4,0) =", gymapi.Vec3(3, 4, 0).length())
check(abs(gymapi.Vec3(3, 4, 0).length() - 5) < 1e-9, "Vec3 length")

q = gymapi.Quat.from_axis_angle(gymapi.Vec3(0, 0, 1), np.pi / 2)
print("q(z, 90deg) =", q)
r = q.rotate(gymapi.Vec3(1, 0, 0))
print("q * (1,0,0) =", r)
check(abs(r.y - 1) < 1e-6, "Quat.rotate")
e = gymapi.Quat.from_euler_zyx(0.1, 0.2, 0.3)
rr, pp, yy = e.to_euler_zyx()
check(max(abs(rr - 0.1), abs(pp - 0.2), abs(yy - 0.3)) < 1e-6, "euler_zyx roundtrip")
check(abs(((e.inverse() * e).normalize()).w) > 1 - 1e-6, "Quat.inverse")

t = gymapi.Transform(gymapi.Vec3(1, 2, 3), q)
p = t.transform_point(gymapi.Vec3(1, 0, 0))
print("transform_point =", p)
check(abs(p.y - 3) < 1e-6, "Transform.transform_point")
vv = t.transform_vector(gymapi.Vec3(1, 0, 0))
check(abs(vv.y - 1) < 1e-6, "Transform.transform_vector (no translation)")
inv = t.inverse()
back = inv.transform_point(p)
check(abs(back.x - 1) < 1e-6 and abs(back.y) < 1e-6, "Transform.inverse")

# numpy dtype bridge (maths.py:113-140)
arr = np.zeros(2, dtype=gymapi.Transform.dtype)
arr[0] = t.to_numpy()
t2 = gymapi.Transform.from_numpy(arr[0])
check(abs(t2.p.z - 3) < 1e-9, "Transform numpy dtype bridge")
t3 = gymapi.Transform.from_buffer(np.array([9, 8, 7, 0, 0, 0, 1.0]))
check(t3.p.x == 9, "Transform.from_buffer")
print("maths OK")
