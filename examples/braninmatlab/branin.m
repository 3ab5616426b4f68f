function result = branin(job_id, params)
% Branin-Hoo objective (reference matlab example parity).
% params.X holds two unit-interval values; rescale to the Branin domain.
u = params.X;
x1 = -5 + 15 * u(1);
x2 = 15 * u(2);
a = 1; b = 5.1/(4*pi^2); c = 5/pi; r = 6; s = 10; t = 1/(8*pi);
result = a*(x2 - b*x1^2 + c*x1 - r)^2 + s*(1-t)*cos(x1) + s;
fprintf('branin(%f, %f) = %f\n', x1, x2, result);
end
