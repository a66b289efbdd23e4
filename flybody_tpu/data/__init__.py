"""Native data runtime: packed trajectory datasets + C++ mmap loader."""
