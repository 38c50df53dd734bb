%
(rounded slot: linear moves joined by circular arcs)
G00 X0 Y0 Z0
G01 X12 Y0 Z0
G02 X12 Y6 I0 J3
G01 X0 Y6 Z0
G03 X0 Y0 I0 J-3
%
