from .metrics import calculate_fid, calculate_isc, calculate_kid, calculate_kl
