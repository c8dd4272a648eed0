"""File-format interfaces: generic raw/Fortran, FluSI HDF5, MSSG."""
