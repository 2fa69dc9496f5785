OutputScalarNorm(V) time: 0 first: 0 second: 0 infty: 0
OutputScalarNorm(V) time: 0.4 first: 0.439799 second: 0.481981 infty: 0.748061
OutputScalarNorm(V) time: 0.533679 first: 0.178014 second: 0.199807 infty: 0.309801
