"""State estimation: EKF SLAM (nuslam) and RBPF grid SLAM (bmapping)."""
