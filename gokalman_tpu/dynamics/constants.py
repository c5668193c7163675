"""Earth constants (km, s, rad).  Values match the standard
astrodynamics set used by the reference's dynamics dependency
(hybrid_test.go:74-100 scenario scale)."""

GM_EARTH = 398600.4415  # km^3/s^2
R_EARTH = 6378.1363  # km
J2 = 1.082626925638815e-3
J3 = -2.5324105185677225e-6
EARTH_ROTATION_RATE = 7.292115900231276e-5  # rad/s (hybrid_test.go:100)
